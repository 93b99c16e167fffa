"""Multiresolution hash-grid encoding (Instant-NGP).

TPU-native replacement for the tiny-cuda-nn ``HashGrid`` encoding, the
reference's single hottest native component (bound via
``implementation="tcnn"`` at thermo_nerf/thermal_nerf/thermal_field.py:59 and
nerfstudio fields/nerfacto_field.py / density_fields.py).

Design (TPU-first, not a CUDA translation):
  * All L levels stored as ONE stacked ``[L, T, F]`` table so a single fused
    gather serves every level (one XLA gather instead of L kernel launches).
  * Indices for all ``N x L x 8`` corners are computed vectorized on the VPU;
    the gather + trilinear blend is one fused XLA op. The backward pass is
    XLA's sort-based scatter-add. A Pallas kernel specializing the
    gather/scatter lives in ``thermo_tpu.ops.pallas.hash_grid``.
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
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax import Array

_PRIMES = (1, 2654435761, 805459861)

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
    """tcnn-style init: uniform in [-1e-4, 1e-4], shape [L, T, F]."""
    shape = (spec.num_levels, spec.table_size, spec.features_per_level)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-1e-4, maxval=1e-4)


def _corner_indices_cf(spec: HashGridSpec, grid_coords: Array) -> Array:
    """Map integer grid coords -> flat table indices (channels-first layout).

    ``grid_coords``: int32 [L, 8, 3, N]. Returns int32 [L, 8, N] in [0, T).
    """
    res = jnp.asarray(spec.resolutions, dtype=jnp.int32)[:, None, None]  # [L,1,1]
    x = grid_coords[:, :, 0, :]
    y = grid_coords[:, :, 1, :]
    z = grid_coords[:, :, 2, :]

    dense = x + y * res + z * res * res

    # tcnn spatial hash (uint32 wraparound semantics).
    ux = x.astype(jnp.uint32)
    uy = y.astype(jnp.uint32)
    uz = z.astype(jnp.uint32)
    hashed = (
        ux * jnp.uint32(_PRIMES[0])
        ^ uy * jnp.uint32(_PRIMES[1])
        ^ uz * jnp.uint32(_PRIMES[2])
    ).astype(jnp.int32)

    use_hash = jnp.asarray(spec.use_hash)[:, None, None]  # [L, 1, 1]
    idx = jnp.where(use_hash, hashed, dense)
    return idx & jnp.int32(spec.table_size - 1)


def _hash_corners(spec: HashGridSpec, positions: Array):
    """Shared forward geometry: positions [N, 3] -> (flat_idx [L,8,N] into the
    level-stacked table, frac [L,3,N], per-level idx [L,8,N])."""
    p = positions.T  # [3, N]
    scales = jnp.asarray(spec.scales, dtype=jnp.float32)  # [L]
    scaled = scales[:, None, None] * p[None, :, :] + 0.5  # [L, 3, N]
    floor = jnp.floor(scaled)
    frac = scaled - floor
    base = floor.astype(jnp.int32)
    corners = jnp.asarray(_CORNERS)  # [8, 3]
    grid_coords = base[:, None, :, :] + corners[None, :, :, None]  # [L,8,3,N]
    idx = _corner_indices_cf(spec, grid_coords)  # [L, 8, N]
    return idx, frac


def _corner_weights(frac: Array) -> Array:
    """Trilinear corner weights: frac [L, 3, N] -> [L, 8, N]."""
    corners = jnp.asarray(_CORNERS)
    cf = corners.astype(frac.dtype)  # [8, 3]
    return jnp.prod(
        jnp.where(
            cf[None, :, :, None] == 1, frac[:, None, :, :], 1.0 - frac[:, None, :, :]
        ),
        axis=2,
    )


def hash_encode(table: Array, positions: Array, spec: HashGridSpec) -> Array:
    """Encode positions through the multires hash grid.

    ``table``: [L, T, F] parameters. ``positions``: [..., 3] in [0, 1]^3.
    Returns [..., L * F] features (table dtype).

    TPU layout note: every large intermediate keeps the big N (=points) axis
    MINOR-most. A naive [N, L, 8, F] gather puts F=2 in the 128-lane minor
    dimension, and XLA pads 2 -> 128 (64x memory blowup — observed as a 65GB
    HBM OOM on v5e). Channels-first [F, L, 8, N] tensors tile perfectly
    (N is a multiple of the lane width in practice), and the single final
    transpose back to [N, L*F] is cheap.

    The backward pass is a custom VJP (see ``_hash_encode_bwd``): XLA's
    scatter-add costs ~60-76ns per [F=2]-row update on v5e but only ~10ns per
    SCALAR update, so the table gradient folds the feature dim into the
    index and issues per-level scalar scatters — measured ~4x faster with
    identical numerics.
    """
    batch_shape = positions.shape[:-1]
    out = _hash_encode_vjp(table, positions.reshape(-1, 3), spec)
    return out.reshape(*batch_shape, spec.out_dim)


def _gather_feats(table: Array, flat_idx: Array, spec: HashGridSpec) -> Array:
    """[L,8,N] level-offset indices -> features [F, L, 8, N]."""
    flat_table_t = table.reshape(-1, spec.features_per_level).T  # [F, L*T]
    return jnp.take(flat_table_t, flat_idx, axis=1)


def _hash_forward(table: Array, positions: Array, spec: HashGridSpec):
    idx, frac = _hash_corners(spec, positions)  # [L,8,N], [L,3,N]
    level_offset = (
        jnp.arange(spec.num_levels, dtype=jnp.int32)[:, None, None] * spec.table_size
    )
    flat_idx = idx + level_offset
    feats = _gather_feats(table, flat_idx, spec)  # [F, L, 8, N]
    w = _corner_weights(frac)  # [L, 8, N]
    out = jnp.sum(feats * w[None].astype(feats.dtype), axis=2)  # [F, L, N]
    n = positions.shape[0]
    return jnp.transpose(out, (2, 1, 0)).reshape(n, spec.out_dim)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _hash_encode_vjp(table: Array, positions: Array, spec: HashGridSpec) -> Array:
    return _hash_forward(table, positions, spec)


def _hash_encode_vjp_fwd(table, positions, spec):
    return _hash_forward(table, positions, spec), (table, positions)


def _hash_encode_vjp_bwd(spec: HashGridSpec, res, g):
    """g: [N, L*F] cotangent.

    d_table: per-level SCALAR scatters (feature dim folded into the index) —
    ~4x cheaper than row scatters on TPU (see module docstring).
    d_positions: chain through the trilinear weights (dw/dfrac) and the
    level scaling; needs a re-gather of the corner features.
    """
    table, positions = res
    L, T, F = spec.num_levels, spec.table_size, spec.features_per_level
    n = positions.shape[0]
    idx, frac = _hash_corners(spec, positions)  # [L,8,N], [L,3,N]
    w = _corner_weights(frac)  # [L, 8, N]

    # cotangent to channels-first [F, L, N]
    g_cf = jnp.transpose(g.reshape(n, L, F), (2, 1, 0)).astype(jnp.float32)

    # ---- d_table: one scalar scatter per level ----
    # values per (corner, feature, point): w[l, c, n] * g_cf[f, l, n]
    d_levels = []
    feature_off = jnp.arange(F, dtype=jnp.int32)[None, :, None]  # [1, F, 1]
    for l in range(L):
        idx_l = idx[l]  # [8, N]
        vals = w[l][:, None, :] * g_cf[:, l, :][None, :, :]  # [8, F, N]
        scalar_idx = idx_l[:, None, :] * F + feature_off  # [8, F, N]
        d_flat = jnp.zeros((T * F,), jnp.float32).at[scalar_idx.reshape(-1)].add(
            vals.reshape(-1)
        )
        d_levels.append(d_flat.reshape(T, F))
    d_table = jnp.stack(d_levels).astype(table.dtype)  # [L, T, F]

    # ---- d_positions ----
    level_offset = (
        jnp.arange(L, dtype=jnp.int32)[:, None, None] * T
    )
    feats = _gather_feats(table, idx + level_offset, spec).astype(jnp.float32)
    # per-corner upstream: s[l, c, n] = sum_f feats[f,l,c,n] * g_cf[f,l,n]
    s = jnp.einsum("flcn,fln->lcn", feats, g_cf)  # [L, 8, N]
    corners = jnp.asarray(_CORNERS).astype(jnp.float32)  # [8, 3]
    # dw/dfrac_d = sign_d * prod_{d' != d} (corner_d' ? frac : 1-frac)
    term = jnp.where(
        corners[None, :, :, None] == 1, frac[:, None, :, :], 1.0 - frac[:, None, :, :]
    )  # [L, 8, 3, N]
    # product over the other two dims, written out explicitly (a division by
    # term would produce wrong gradients where term == 0, i.e. points exactly
    # on grid planes)
    prod_others = jnp.stack(
        [
            term[:, :, 1, :] * term[:, :, 2, :],
            term[:, :, 0, :] * term[:, :, 2, :],
            term[:, :, 0, :] * term[:, :, 1, :],
        ],
        axis=2,
    )  # [L, 8, 3, N]
    sign = jnp.where(corners[None, :, :, None] == 1, 1.0, -1.0)
    dw_dfrac = sign * prod_others  # [L, 8, 3, N]
    d_frac = jnp.einsum("lcn,lcdn->ldn", s, dw_dfrac)  # [L, 3, N]
    scales = jnp.asarray(spec.scales, dtype=jnp.float32)  # [L]
    d_p = jnp.sum(d_frac * scales[:, None, None], axis=0).T  # [N, 3]
    return d_table, d_p.astype(positions.dtype)


_hash_encode_vjp.defvjp(_hash_encode_vjp_fwd, _hash_encode_vjp_bwd)
