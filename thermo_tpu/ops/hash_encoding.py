"""Multiresolution hash-grid encoding (Instant-NGP).

TPU-native replacement for the tiny-cuda-nn ``HashGrid`` encoding, the
reference's single hottest native component (bound via
``implementation="tcnn"`` at thermo_nerf/thermal_nerf/thermal_field.py:59 and
nerfstudio fields/nerfacto_field.py / density_fields.py).

Design (TPU-first, not a CUDA translation):
  * All L levels stored as ONE stacked ``[L, T, F]`` table so a single fused
    gather serves every level (one XLA gather instead of L kernel launches).
  * Indices for all ``N x L x 8`` corners are computed vectorized on the VPU
    from per-axis [L, N] arrays; the gather + trilinear blend is one fused
    XLA op. The backward pass issues scalar scatter-adds (see hash_encode),
    optionally subsampled over corners (unbiased stochastic estimators).
  * Per-level dense-vs-hash mapping follows tcnn: a level whose dense grid
    fits in the table uses dense (collision-free) indexing, otherwise the
    tcnn spatial hash (primes 1 / 2654435761 / 805459861, xor-combine).
  * Static shapes everywhere: resolutions/scales are Python-time constants
    baked into the jaxpr.

Matches tcnn's geometric level scaling: ``scale_l = b^l * base - 1`` with
``b = exp((ln(max) - ln(base)) / (L - 1))``, ``pos = p * scale + 0.5``.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

_PRIMES = (1, 2654435761, 805459861)

# Dense-level matmul path: the largest allowed element count of the
# [N, (R+1)^2] four-hot operand (transiently materialized in fwd and bwd).
# 2^29 f32 elements = 2GB. 0 disables the path (pure gather everywhere).
_DENSE_MATMUL_BUDGET = int(
    os.environ.get("THERMO_TPU_DENSE_MATMUL_BUDGET", 1 << 29)
)

# 8 corner offsets of a unit cube, static.
_CORNERS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=np.int32
)  # [8, 3]


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static geometry of a multires hash grid (hashable; safe as jit static arg)."""

    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_res: int = 16
    max_res: int = 2048

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def growth_factor(self) -> float:
        if self.num_levels == 1:
            return 1.0
        return float(
            np.exp((np.log(self.max_res) - np.log(self.base_res)) / (self.num_levels - 1))
        )

    @property
    def scales(self) -> np.ndarray:
        """tcnn grid_scale per level: b^l * base_res - 1."""
        levels = np.arange(self.num_levels)
        return (self.growth_factor**levels) * self.base_res - 1.0

    @property
    def resolutions(self) -> np.ndarray:
        """tcnn grid_resolution per level: ceil(scale) + 1."""
        return np.ceil(self.scales).astype(np.int64) + 1

    @property
    def use_hash(self) -> np.ndarray:
        """Per level: True when the dense grid overflows the table (tcnn rule:
        hash iff stride = res^3 > hashmap_size)."""
        return (self.resolutions.astype(np.int64) ** 3) > self.table_size


def init_hash_table(key: jax.Array, spec: HashGridSpec, dtype=jnp.float32) -> Array:
    """tcnn-style init: uniform in [-1e-4, 1e-4].

    Table layout is CHANNELS-FIRST FLAT ``[F, L*T]`` (feature-major), chosen
    so the three big per-step consumers agree on one byte order with no
    relayout copies (round-3 trace finding: the former [L, T*F] param forced
    ~6ms/step of {0,1}<->{1,0} copies + retiled reshapes between the scatter
    output and the optimizer):
      * forward gather reads [F, L*T] rows directly (take axis=1);
      * the backward row scatter writes [F] columns at flat indices;
      * Adam moments tile as T(8,128) with the huge axis minor — no padding.
    """
    shape = (spec.features_per_level, spec.num_levels * spec.table_size)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-1e-4, maxval=1e-4)


class _AxisGeometry:
    """Per-axis corner geometry shared by the exact and stochastic paths.

    TPU layout note: everything is built from per-axis [L, N] arrays combined
    per corner — NEVER a [L, 8, 3, N] tensor. A [L,8,3,N] pipeline puts 3 in
    the second-minor (sublane) dim (padded 3 -> 8) and materializes multi-GB
    intermediates on the big proposal batches.

    Fields (each a 3-tuple over axes of ([L,N] offset-0, [L,N] offset-1)):
      dense_c  per-axis dense-grid contributions (combine with +)
      hash_c   per-axis tcnn spatial-hash contributions (combine with xor,
               uint32 wraparound; primes 1 / 2654435761 / 805459861)
    plus frac [L,3,N], use_hash [L,1(,1)] selector and the table-size mask.
    """

    def __init__(self, spec: HashGridSpec, positions: Array, lo: int = 0):
        # ``lo``: first level covered (static) — all [L, ...] arrays here
        # span levels [lo, num_levels) when a dense prefix is handled by
        # the matmul path (_dense_encode) instead.
        p = positions.T  # [3, N]
        scales = jnp.asarray(spec.scales[lo:], dtype=jnp.float32)  # [L]
        scaled = scales[:, None, None] * p[None, :, :] + 0.5  # [L, 3, N]
        floor = jnp.floor(scaled)
        self.frac = scaled - floor
        base = floor.astype(jnp.int32)  # [L, 3, N]

        res = jnp.asarray(spec.resolutions[lo:], dtype=jnp.int32)[:, None]
        strides = (jnp.ones_like(res), res, res * res)
        self.use_hash = jnp.asarray(spec.use_hash[lo:])[:, None]  # [L, 1]
        self.mask = jnp.int32(spec.table_size - 1)

        self.dense_c = []
        self.hash_c = []
        for d in range(3):
            b = base[:, d, :]
            self.dense_c.append((b * strides[d], (b + 1) * strides[d]))
            ub = b.astype(jnp.uint32)
            prime = jnp.uint32(_PRIMES[d])
            self.hash_c.append((ub * prime, (ub + jnp.uint32(1)) * prime))

    def corner_index(self, bx, by, bz) -> Array:
        """Table index for per-axis offsets. Offsets may be static 0/1 ints
        (-> [L, N]) or traced bit arrays [L, K, N] (-> [L, K, N])."""

        def pick(pair, bit, cast=None):
            a0, a1 = pair
            if isinstance(bit, (int, np.integer)):
                out = a1 if bit else a0
                if cast is not None:
                    out = out.astype(cast)
                return out if out.ndim == 3 else out[:, None, :]
            a0 = a0[:, None, :]
            a1 = a1[:, None, :]
            if cast is not None:
                a0, a1 = a0.astype(cast), a1.astype(cast)
            return jnp.where(bit, a1, a0)

        static = all(isinstance(b, (int, np.integer)) for b in (bx, by, bz))
        dense = (
            pick(self.dense_c[0], bx)
            + pick(self.dense_c[1], by)
            + pick(self.dense_c[2], bz)
        )
        hashed = (
            pick(self.hash_c[0], bx)
            ^ pick(self.hash_c[1], by)
            ^ pick(self.hash_c[2], bz)
        ).astype(jnp.int32)
        use_hash = self.use_hash[:, :, None] if dense.ndim == 3 else self.use_hash
        idx = jnp.where(use_hash, hashed, dense) & self.mask
        return idx[:, 0, :] if (static and idx.ndim == 3) else idx

    def frac_factor(self, axis: int, bit) -> Array:
        """Per-axis trilinear factor: frac if the corner bit is 1 else
        1-frac. Static int bit -> [L, N]; traced [L, K, N] bit -> [L, K, N]."""
        fr = self.frac[:, axis, :]
        if isinstance(bit, (int, np.integer)):
            return fr if bit else 1.0 - fr
        fr = fr[:, None, :]
        return jnp.where(bit, fr, 1.0 - fr)


def _hash_corners(spec: HashGridSpec, positions: Array, lo: int = 0):
    """Exact forward geometry: positions [N, 3] -> (per-level corner table
    indices [L,8,N] in [0,T), frac [L,3,N]) for levels [lo, num_levels)."""
    geo = _AxisGeometry(spec, positions, lo)
    idx = jnp.stack(
        [geo.corner_index(cx, cy, cz) for cx, cy, cz in np.asarray(_CORNERS)],
        axis=1,
    )  # [L, 8, N]
    return idx, geo.frac


def _corner_weights(frac: Array) -> Array:
    """Trilinear corner weights: frac [L, 3, N] -> [L, 8, N].

    Built from per-axis [L, N] factors (see _hash_corners layout note)."""
    f = ((1.0 - frac[:, 0, :], frac[:, 0, :]),
         (1.0 - frac[:, 1, :], frac[:, 1, :]),
         (1.0 - frac[:, 2, :], frac[:, 2, :]))
    return jnp.stack(
        [f[0][cx] * f[1][cy] * f[2][cz] for cx, cy, cz in np.asarray(_CORNERS)],
        axis=1,
    )


def hash_encode(
    table: Array,
    positions: Array,
    spec: HashGridSpec,
    grad_corners: int = 0,
    fwd_corners: int = 0,
    grad_levels: int = 0,
) -> Array:
    """Encode positions through the multires hash grid.

    ``table``: [F, L*T] parameters (channels-first flat, see
    ``init_hash_table``). ``positions``: [..., 3] in [0, 1]^3.
    Returns [..., L * F] features (table dtype).

    TPU layout note: every large intermediate keeps the big N (=points) axis
    MINOR-most. A naive [N, L, 8, F] gather puts F=2 in the 128-lane minor
    dimension, and XLA pads 2 -> 128 (64x memory blowup — observed as a 65GB
    HBM OOM on v5e). Channels-first [F, L, 8, N] tensors tile perfectly
    (N is a multiple of the lane width in practice), and the single final
    transpose back to [N, L*F] is cheap.

    The backward pass is a custom VJP: XLA's scatter-add costs ~45ns per
    [F=2]-row update on v5e but only ~9ns per SCALAR update, so the table
    gradient folds the feature dim into the index and issues scalar
    scatters. Residuals are (table, positions) — NOT the gathered features,
    which would stack across the scanned train steps (measured OOM).

    ``grad_corners`` (0 = exact): stochastic backward over ``grad_corners``
    corners drawn from Categorical(trilinear weights) per (point, level).
    The table gradient routes the cotangent to the drawn corners with value
    g/k — UNBIASED (E = sum_c w_c g exactly), 8/k less scatter traffic. The
    position gradient is importance-weighted over the SAME draws
    (s_c dw_c / (k w_c), w clamped at 1/64 for bounded variance — a tiny,
    documented bias) and gathers k corner rows instead of 8. Randomness is
    derived statelessly from the sample coordinates (fresh every step
    because ray jitter never repeats positions).

    ``fwd_corners`` (0 = exact): stochastic trilinear FORWARD — evaluate the
    mean of ``fwd_corners`` Categorical(w)-sampled corner features instead
    of the 8-corner weighted sum (unbiased for the encoding itself). Gather
    and scatter traffic both drop 8/k. Position gradients through the
    encoding are zero in this mode — intended for proposal density fields
    only (their position gradients only tune the camera optimizer slightly).

    ``grad_levels`` (0 = all levels): additionally subsample the TABLE
    gradient over levels — each point scatters into ``grad_levels``
    uniformly-drawn levels with value scaled by L/j (unbiased; scatter
    traffic drops L/j on top of the corner subsampling). Requires a
    stochastic mode (``grad_corners`` or ``fwd_corners``); position
    gradients are unaffected (they keep using all levels).
    """
    batch_shape = positions.shape[:-1]
    p = positions.reshape(-1, 3)
    j = int(grad_levels)
    if j >= spec.num_levels:
        j = 0
    if fwd_corners:
        out = _hash_encode_stoch(table, p, spec, int(fwd_corners), j)
    else:
        assert not (j and not grad_corners), (
            "grad_levels requires grad_corners>0 (the exact path scatters "
            "per level by construction)"
        )
        # exact path: run the dense (collision-free) prefix levels as MXU
        # einsum contractions — numerically equivalent within float rounding
        # (the einsum accumulates in f32 at Precision.HIGHEST with a
        # different summation order than the gather path's table-dtype
        # accumulation; parity test holds at rtol 1e-5, and the gap will
        # widen if bf16 tables land) and no per-corner gather/scatter
        # traffic (see _dense_level_encode)
        nd = (
            _num_dense_matmul_levels(spec, p.shape[0])
            if not grad_corners and not j
            else 0
        )
        if nd:
            parts = [_dense_encode(table, p, spec, nd)]
            if nd < spec.num_levels:
                parts.append(_hash_encode_vjp(table, p, spec, 0, 0, nd))
            out = parts[0] if len(parts) == 1 else jnp.concatenate(parts, -1)
        else:
            out = _hash_encode_vjp(table, p, spec, int(grad_corners), j)
    return out.reshape(*batch_shape, spec.out_dim)


def _gather_feats(table: Array, flat_idx: Array, spec: HashGridSpec) -> Array:
    """table [F, L*T]; [L,8,N] level-offset indices -> features [F, L, 8, N]."""
    return jnp.take(table, flat_idx, axis=1)


def _num_dense_matmul_levels(spec: HashGridSpec, n: int) -> int:
    """How many prefix levels to run through the dense matmul path.

    A level qualifies when it is dense (collision-free — resolutions grow
    monotonically, so dense levels are a prefix) and its [N, (R+1)^2]
    four-hot operand fits the transient-memory budget."""
    if _DENSE_MATMUL_BUDGET <= 0:
        return 0
    nd = 0
    for lvl in range(spec.num_levels):
        if spec.use_hash[lvl]:
            break
        rp = int(spec.resolutions[lvl]) + 1
        if rp * rp * n > _DENSE_MATMUL_BUDGET:
            # over-budget levels stay on the gather path — chunking the N
            # axis under lax.map + per-chunk remat was measured SLOWER than
            # gathers on v5e (sequential chunks + recompute; PERFORMANCE.md)
            break
        nd += 1
    return nd


def _dense_level_encode(
    table: Array, positions: Array, spec: HashGridSpec, lvl: int
) -> Array:
    """Exact trilinear encode of ONE dense level as MXU contractions.

    TPU-first replacement for per-corner gathers on the collision-free
    coarse levels (the tcnn kernels the reference binds at
    thermal_field.py:59 do per-corner random access — the right design on a
    GPU, ~10ns/index on v5e where random HBM access is latency-bound,
    PERFORMANCE.md). Dense trilinear interpolation is separable, so it is
    computed as einsum chains instead:

      out[n,f] = sum_{z,y,x} wz[n,z] * wy[n,y] * wx[n,x] * ext[f, z, y, x]

    with per-axis TWO-HOT weight rows ((1-frac) at the floor cell, frac at
    floor+1). Cost is bandwidth/MXU work independent of the table's access
    pattern; the backward is the transposed einsums — the per-corner
    scatter-adds of the gather path disappear entirely. ``jax.checkpoint``
    wraps the level so the [N, (R+1)^2] four-hot operand is recomputed in
    the backward instead of residualized across the scanned train steps.

    Flat-index parity: the gather path indexes dense levels as
    ``(x + R*y + R^2*z) & (T-1)`` WITHOUT per-axis clamping, so a floor+1
    coordinate at the +x/+y/+z border reads the next row/plane (tcnn's own
    border semantics). ``ext`` is built by gathering the level block through
    exactly that index map for x,y,z in [0, R], reproducing the overflow
    behavior bit-for-bit.
    """
    R = int(spec.resolutions[lvl])
    rp = R + 1
    T = spec.table_size
    f32 = jnp.float32

    scale = f32(float(spec.scales[lvl]))
    scaled = positions.astype(f32) * scale + 0.5  # [N, 3]
    floor = jnp.floor(scaled)
    base = floor.astype(jnp.int32)  # [N, 3]
    frac = scaled - floor  # [N, 3]

    # ext[f, z*rp + y, x] = table[f, ((x + R*y + R^2*z) & (T-1)) + lvl*T]
    ax = np.arange(rp, dtype=np.int64)
    e = ax[None, None, :] + R * ax[None, :, None] + (R * R) * ax[:, None, None]
    e = ((e & (T - 1)) + lvl * T).astype(np.int32).reshape(rp * rp, rp)
    ext = jnp.take(table, jnp.asarray(e), axis=1).astype(f32)  # [F, rp^2, rp]

    iota = jnp.arange(rp, dtype=jnp.int32)[None, :]  # [1, rp]

    def twohot(axis: int) -> Array:
        b = base[:, axis, None]
        f = frac[:, axis, None]
        return jnp.where(iota == b, 1.0 - f, 0.0) + jnp.where(
            iota == b + 1, f, 0.0
        )  # [N, rp]

    wx, wy, wz = twohot(0), twohot(1), twohot(2)
    wzy = (wz[:, :, None] * wy[:, None, :]).reshape(-1, rp * rp)  # [N, rp^2]
    t = jnp.einsum(
        "na,fax->nfx", wzy, ext, precision=jax.lax.Precision.HIGHEST
    )
    out = jnp.einsum(
        "nx,nfx->nf", wx, t, precision=jax.lax.Precision.HIGHEST
    )
    return out.astype(table.dtype)  # [N, F]


def _dense_encode(
    table: Array, positions: Array, spec: HashGridSpec, nd: int
) -> Array:
    """Encode the dense prefix levels [0, nd) via the matmul path; [N, nd*F]."""
    outs = [
        jax.checkpoint(
            functools.partial(_dense_level_encode, spec=spec, lvl=lvl)
        )(table, positions)
        for lvl in range(nd)
    ]
    return jnp.concatenate(outs, axis=-1)


def _hash_forward(
    table: Array, positions: Array, spec: HashGridSpec, lo: int = 0
):
    """Returns (out [N, Lh*F], feats [F,Lh,8,N], idx [Lh,8,N], frac
    [Lh,3,N]) for the Lh = num_levels - lo levels starting at ``lo``."""
    idx, frac = _hash_corners(spec, positions, lo)  # [Lh,8,N], [Lh,3,N]
    level_offset = (
        lo + jnp.arange(spec.num_levels - lo, dtype=jnp.int32)[:, None, None]
    ) * spec.table_size
    flat_idx = idx + level_offset
    feats = _gather_feats(table, flat_idx, spec)  # [F, Lh, 8, N]
    w = _corner_weights(frac)  # [Lh, 8, N]
    out = jnp.sum(feats * w[None].astype(feats.dtype), axis=2)  # [F, Lh, N]
    n = positions.shape[0]
    out_dim = (spec.num_levels - lo) * spec.features_per_level
    return jnp.transpose(out, (2, 1, 0)).reshape(n, out_dim), feats, idx, frac


def _derived_uniforms(idx0: Array, frac: Array, k: int, salt: int = 0x9E3779B9):
    """Stateless per-(draw, level, point) uniforms in [0, 1).

    Seeds from the corner-0 hash index and the fractional coordinate bits:
    ray jitter makes positions fresh every step, so these uniforms are fresh
    every step without threading a PRNG key through the VJP.
    ``idx0``: [L, N] int32; ``frac``: [L, 3, N] f32. Returns [k, L, N] f32.
    """
    bits = jax.lax.bitcast_convert_type(frac, jnp.uint32)  # [L, 3, N]
    h = idx0.astype(jnp.uint32)
    h = h ^ (bits[:, 0] * jnp.uint32(0x85EBCA6B))
    h = h ^ (bits[:, 1] * jnp.uint32(0xC2B2AE35))
    h = h ^ (bits[:, 2] * jnp.uint32(0x27D4EB2F))
    draw = (jnp.arange(k, dtype=jnp.uint32) + 1)[:, None, None] * jnp.uint32(salt)
    hs = h[None] ^ draw  # [k, L, N]
    # murmur3-style finalizer
    hs = hs ^ (hs >> 16)
    hs = hs * jnp.uint32(0x7FEB352D)
    hs = hs ^ (hs >> 15)
    hs = hs * jnp.uint32(0x846CA68B)
    hs = hs ^ (hs >> 16)
    return (hs >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2.0**-24)


def _sample_corner_bits(geo: _AxisGeometry, k: int):
    """Draw k corners per (level, point) ~ Categorical(trilinear weights).

    The trilinear weights factorize, w_c = prod_d factor_d(c_d), so a
    categorical draw over the 8 corners is exactly three independent
    per-axis Bernoulli(frac_d) bits — no cdf, no 8-way compare, no
    take_along_axis (those cost more than the gathers they feed, measured).

    Returns (bits = (bx, by, bz), each bool [L, k, N]; idx_sel [L, k, N]).
    """
    seed = geo.hash_c[0][0] ^ geo.hash_c[1][0] ^ geo.hash_c[2][0]  # [L, N]
    u = _derived_uniforms(seed, geo.frac, 3 * k)  # [3k, L, N]
    bits = []
    for d in range(3):
        fr = geo.frac[:, d, :][None]  # [1, L, N]
        bits.append(jnp.transpose(u[d * k : (d + 1) * k] < fr, (1, 0, 2)))
    return tuple(bits), geo.corner_index(*bits)


def _sample_levels(geo: _AxisGeometry, j: int, num_levels: int) -> Array:
    """Draw j level ids per point ~ Uniform{0..L-1}; [j, N] int32.

    Derived statelessly from the level-0 geometry (fresh every step via ray
    jitter, same trick as the corner draws; distinct salt so level draws are
    independent of corner draws)."""
    seed = (geo.hash_c[0][0] ^ geo.hash_c[1][0] ^ geo.hash_c[2][0])[:1]  # [1, N]
    u = _derived_uniforms(seed, geo.frac[:1], j, salt=0x61C88647)  # [j, 1, N]
    lvl = jnp.minimum(
        (u[:, 0, :] * num_levels).astype(jnp.int32), num_levels - 1
    )
    return lvl  # [j, N]


def _level_subsampled_scatter(
    idx_sel: Array,
    g_cf: Array,
    geo: _AxisGeometry,
    spec: HashGridSpec,
    k: int,
    j: int,
    dtype,
) -> Array:
    """Table gradient with joint (level, corner) subsampling.

    ``idx_sel``: [L, K, N] per-level corner-draw indices (k corner draws per
    level, already computed); ``g_cf``: [F, L, N] cotangent. Each point
    scatters only into ``j`` uniformly-drawn levels, with value
    g * (L/j) / k — unbiased (E over level draws = sum over levels).
    Scatter traffic: N * j * k updates (vs N * L * k). Returns [F, L*T].
    """
    L, T, F = spec.num_levels, spec.table_size, spec.features_per_level
    n = g_cf.shape[-1]
    lvl = _sample_levels(geo, j, L)  # [j, N]
    onehot = (
        jnp.arange(L, dtype=jnp.int32)[:, None, None] == lvl[None]
    )  # [L, j, N] bool
    # select the drawn level's corner indices / cotangent via masked sums
    # (pure VPU; take_along_axis over the L axis would lower to gathers)
    idx_j = jnp.sum(
        jnp.where(onehot[:, :, None, :], idx_sel[:, None, :, :], 0), axis=0
    )  # [j, K, N]
    g_j = jnp.einsum(
        "fln,ljn->fjn", g_cf, onehot.astype(jnp.float32)
    )  # [F, j, N]
    col_idx = idx_j + lvl[:, None, :] * T  # [j, K, N]
    vals = jnp.broadcast_to(
        (g_j * (float(L) / (j * k)))[:, :, None, :], (F, j, k, n)
    )
    if F >= _ROW_SCATTER_MIN_F:
        # wide features: scatter [F]-wide columns (see _scatter_scalar_fused)
        d = jnp.zeros((F, L * T), jnp.float32).at[:, col_idx.reshape(-1)].add(
            vals.reshape(F, -1)
        )
        return d.astype(dtype)
    flat = col_idx[None] + (
        jnp.arange(F, dtype=jnp.int32) * (L * T)
    )[:, None, None, None]  # [F, j, K, N] feature-major flat indices
    d = jnp.zeros((F * L * T,), jnp.float32).at[flat.reshape(-1)].add(
        vals.reshape(-1)
    )
    return d.reshape(F, L * T).astype(dtype)


# Feature width at/above which a row scatter beats F folded scalar
# scatter-adds. Measured on v5e: F=2 rows cost 45ns vs 2x10ns scalar
# (scalar wins); F=8 rows cost 41ns vs 8x10ns scalar (row wins ~2x).
_ROW_SCATTER_MIN_F = 8


def _scatter_scalar_fused(
    idx_sel: Array, vals: Array, spec: HashGridSpec, dtype
) -> Array:
    """One fused scatter-add over all levels.

    ``idx_sel``: [L, K, N] per-level indices; ``vals``: [F, L, K, N] f32
    (already scaled). Returns d_table [F, L*T] (channels-first flat).

    Narrow features (F < 8) fold the feature dim into the index and issue
    scalar adds; wide features (F >= 8, e.g. the thermal-nerf-tpu 4x8
    layout) scatter whole [F]-wide columns — per-update cost on v5e is
    ~10ns/scalar but only ~41ns/8-wide-column (true_microbench), so columns
    win ~2x there."""
    L, T, F = spec.num_levels, spec.table_size, spec.features_per_level
    level_off = jnp.arange(L, dtype=jnp.int32)[:, None, None] * T
    col_idx = idx_sel + level_off  # [L, K, N]
    if F >= _ROW_SCATTER_MIN_F:
        d = jnp.zeros((F, L * T), jnp.float32).at[:, col_idx.reshape(-1)].add(
            vals.reshape(F, -1)
        )
        return d.astype(dtype)
    flat = col_idx[None] + (
        jnp.arange(F, dtype=jnp.int32) * (L * T)
    )[:, None, None, None]  # [F, L, K, N] feature-major flat indices
    d = jnp.zeros((F * L * T,), jnp.float32).at[flat.reshape(-1)].add(
        vals.reshape(-1)
    )
    return d.reshape(F, L * T).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _hash_encode_vjp(
    table: Array,
    positions: Array,
    spec: HashGridSpec,
    grad_corners: int = 0,
    grad_levels: int = 0,
    lo: int = 0,
) -> Array:
    return _hash_forward(table, positions, spec, lo)[0]


def _hash_encode_vjp_fwd(table, positions, spec, grad_corners, grad_levels, lo):
    # Residuals are deliberately (table, positions), NOT the gathered corner
    # features: the train step runs under a lax.scan over steps_per_jit_loop
    # iterations, and scan AD stacks every residual across iterations —
    # saving feats ([F,L,8,N] f32, ~660MB across the three fields) residualizes
    # ~6.6GB at 10 steps/scan (measured HBM OOM on v5e). Recomputing the
    # corner geometry + one re-gather in bwd costs ~45ms/step instead.
    return _hash_forward(table, positions, spec, lo)[0], (table, positions)


def _hash_encode_vjp_bwd(
    spec: HashGridSpec, grad_corners: int, grad_levels: int, lo: int, res, g
):
    """g: [N, Lh*F] cotangent for the levels [lo, num_levels).

    d_table: scalar scatters (feature dim folded into the index — ~5x
    cheaper than row scatters on v5e, see kernel_microbench). Exact mode
    scatters all 8 corners weighted by w; ``grad_corners=k`` scatters k
    Categorical(w)-sampled corners with value g/k (unbiased, 8/k less
    traffic). d_positions: exact via the residual features.
    """
    assert lo == 0 or (grad_corners == 0 and grad_levels == 0), (
        "a dense matmul prefix (lo>0) only composes with the exact path"
    )
    table, positions = res
    table_dtype, pos_dtype = table.dtype, positions.dtype
    L, T, F = spec.num_levels - lo, spec.table_size, spec.features_per_level
    n = g.shape[0]
    geo = _AxisGeometry(spec, positions, lo)

    # cotangent to channels-first [F, L, N]
    g_cf = jnp.transpose(g.reshape(n, L, F), (2, 1, 0)).astype(jnp.float32)
    level_offset = (lo + jnp.arange(L, dtype=jnp.int32)[:, None, None]) * T
    scales = jnp.asarray(spec.scales[lo:], dtype=jnp.float32)[:, None]  # [L, 1]

    if grad_corners:
        k = int(grad_corners)
        bits, idx_sel = _sample_corner_bits(geo, k)  # bits [L,k,N] x3
        if grad_levels:
            d_table = _level_subsampled_scatter(
                idx_sel, g_cf, geo, spec, k, grad_levels, table_dtype
            )
        else:
            vals = jnp.broadcast_to(
                (g_cf / k)[:, :, None, :], (F, L, k, n)
            )  # [F, L, k, N]
            d_table = _scatter_scalar_fused(idx_sel, vals, spec, table_dtype)

        # ---- d_positions, sampled-corner estimator ----
        # Importance-weighted over the SAME Categorical(w) draws:
        # E[ sum_j s_{c_j} dw_{c_j}/dfrac / (k w_{c_j}) ] = sum_c s_c dw_c.
        # w is clamped below at 1/64 (rarely-drawn corners), trading a tiny
        # bias for bounded variance. Gathers k corner rows instead of 8.
        feats_sel = _gather_feats(table, idx_sel + level_offset, spec).astype(
            jnp.float32
        )  # [F, L, k, N]
        s_sel = jnp.einsum("flkn,fln->lkn", feats_sel, g_cf)  # [L, k, N]
        fx = geo.frac_factor(0, bits[0])  # [L, k, N]
        fy = geo.frac_factor(1, bits[1])
        fz = geo.frac_factor(2, bits[2])
        scale_sel = s_sel / (k * jnp.maximum(fx * fy * fz, 1.0 / 64.0))
        sgn = lambda b: 2.0 * b.astype(jnp.float32) - 1.0
        d_frac = (
            jnp.sum(scale_sel * sgn(bits[0]) * fy * fz, axis=1),
            jnp.sum(scale_sel * sgn(bits[1]) * fx * fz, axis=1),
            jnp.sum(scale_sel * sgn(bits[2]) * fx * fy, axis=1),
        )  # 3 x [L, N]
        d_p = jnp.stack(
            [jnp.sum(d_frac[d] * scales, axis=0) for d in range(3)], axis=-1
        )
        return d_table, d_p.astype(pos_dtype)

    # ---- exact path ----
    idx = jnp.stack(
        [geo.corner_index(cx, cy, cz) for cx, cy, cz in np.asarray(_CORNERS)],
        axis=1,
    )  # [L, 8, N]
    w = _corner_weights(geo.frac)  # [L, 8, N]

    # d_table: one scalar scatter per level (feature dim folded into the
    # index, feature-major to match the [F, L*T] layout); a dense matmul
    # prefix (lo>0) contributes via _dense_encode's own AD, so its blocks
    # here are zero.
    d_levels = [jnp.zeros((F, T), jnp.float32)] * lo
    feature_off = (jnp.arange(F, dtype=jnp.int32) * T)[:, None, None]  # [F,1,1]
    for l in range(L):
        idx_l = idx[l]  # [8, N]
        vals = g_cf[:, l, :][:, None, :] * w[l][None, :, :]  # [F, 8, N]
        scalar_idx = idx_l[None, :, :] + feature_off  # [F, 8, N]
        d_flat = jnp.zeros((F * T,), jnp.float32).at[
            scalar_idx.reshape(-1)
        ].add(vals.reshape(-1))
        d_levels.append(d_flat.reshape(F, T))
    d_table = (
        jnp.stack(d_levels, axis=1)
        .reshape(F, spec.num_levels * T)
        .astype(table_dtype)
    )

    # d_positions: exact, needs one re-gather of the corner feats.
    feats = _gather_feats(table, idx + level_offset, spec).astype(jnp.float32)
    # per-corner upstream: s[l, c, n] = sum_f feats[f,l,c,n] * g_cf[f,l,n]
    s = jnp.einsum("flcn,fln->lcn", feats, g_cf)  # [L, 8, N]
    # dw/dfrac_d at corner c = sign_d(c) * prod_{d' != d} factor_{d'}(c).
    # Per-axis [L,N] factors accumulated over the 8 static corners — no
    # [L,8,3,N] tensor. Written product-form (no division) so points exactly
    # on grid planes keep finite gradients.
    d_frac = [0.0, 0.0, 0.0]
    for c, (cx, cy, cz) in enumerate(np.asarray(_CORNERS)):
        sc = s[:, c, :]  # [L, N]
        sign = (1.0 if cx else -1.0, 1.0 if cy else -1.0, 1.0 if cz else -1.0)
        fx, fy, fz = (
            geo.frac_factor(0, cx),
            geo.frac_factor(1, cy),
            geo.frac_factor(2, cz),
        )
        d_frac[0] += sign[0] * sc * (fy * fz)
        d_frac[1] += sign[1] * sc * (fx * fz)
        d_frac[2] += sign[2] * sc * (fx * fy)
    d_p = jnp.stack(
        [jnp.sum(d_frac[d] * scales, axis=0) for d in range(3)], axis=-1
    )  # [N, 3]
    return d_table, d_p.astype(pos_dtype)


_hash_encode_vjp.defvjp(_hash_encode_vjp_fwd, _hash_encode_vjp_bwd)


# ----------------------------------------------------------------------
# stochastic-trilinear forward (proposal fields)
# ----------------------------------------------------------------------
def _stoch_forward(table: Array, positions: Array, spec: HashGridSpec, k: int):
    geo = _AxisGeometry(spec, positions)
    _, idx_sel = _sample_corner_bits(geo, k)  # [L, k, N]
    level_off = jnp.arange(spec.num_levels, dtype=jnp.int32)[:, None, None] * (
        spec.table_size
    )
    feats = _gather_feats(table, idx_sel + level_off, spec)  # [F, L, k, N]
    out = jnp.mean(feats, axis=2)  # [F, L, N] — E[out] = sum_c w_c f_c
    n = positions.shape[0]
    return jnp.transpose(out, (2, 1, 0)).reshape(n, spec.out_dim), idx_sel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _hash_encode_stoch(
    table: Array, positions: Array, spec: HashGridSpec, k: int, grad_levels: int = 0
) -> Array:
    return _stoch_forward(table, positions, spec, k)[0]


def _hash_encode_stoch_fwd(table, positions, spec, k, grad_levels):
    out, _ = _stoch_forward(table, positions, spec, k)
    # residual = positions only (scan AD stacks residuals — see
    # _hash_encode_vjp_fwd); the corner draws are recomputed in bwd and match
    # exactly because _derived_uniforms is a pure function of the geometry.
    return out, (jnp.zeros((), table.dtype), positions)


def _hash_encode_stoch_bwd(spec: HashGridSpec, k: int, grad_levels: int, res, g):
    """Table gradient of the sampled-corner mean; position gradient is zero
    (the sampled forward is piecewise-constant in position — documented
    limitation of fwd_corners mode, fine for proposal density fields)."""
    table_proto, positions = res
    L, F = spec.num_levels, spec.features_per_level
    n = g.shape[0]
    geo = _AxisGeometry(spec, positions)
    _, idx_sel = _sample_corner_bits(geo, k)  # same draws as forward
    g_cf = jnp.transpose(g.reshape(n, L, F), (2, 1, 0)).astype(jnp.float32)
    if grad_levels:
        d_table = _level_subsampled_scatter(
            idx_sel, g_cf, geo, spec, k, grad_levels, table_proto.dtype
        )
    else:
        vals = jnp.broadcast_to((g_cf / k)[:, :, None, :], (F, L, k, n))
        d_table = _scatter_scalar_fused(idx_sel, vals, spec, table_proto.dtype)
    return d_table, jnp.zeros_like(positions)


_hash_encode_stoch.defvjp(_hash_encode_stoch_fwd, _hash_encode_stoch_bwd)
