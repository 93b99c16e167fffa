"""Triplane (K-planes / TensoRF-VM-class) grid encoding as MXU matmuls.

TPU-native NON-SEPARABLE alternative encoding for the proposal density
fields (reference role: HashMLPDensityField, nerfstudio
``fields/density_fields.py``, bound at thermal_nerf_model.py:118-149).

Motivation (round-3 finding, PERFORMANCE.md): the CP-factorized proposal
encoding (ops/lowrank.py) runs at MXU speed but its quality ceiling is
STRUCTURAL — a separable rank-R density sum_r vx(x)vy(y)vz(z) cannot shape
the hierarchical sample distribution the way a hash grid can (iso-wall-clock
ablations qa_r3: CP proposals cost ~1.9dB thermal PSNR regardless of rank).
Hash-grid proposals shape samples well but their per-corner random access
costs ~10-15ns/index on v5e (latency-bound, ~100-550ms/step).

A triplane factorization sits between: features are built from three 2-D
planes, one per axis pair,

  f_k(x, y, z) = Pxy_k(x, y) * Pxz_k(x, z) * Pyz_k(y, z)      (K-planes)

with each plane bilinearly interpolated. Every pairwise interaction is
representable (e.g. a radial bump exp(-a r^2) is exactly rank-1: it splits
into three pairwise Gaussian factors), so the density can localize mass in
ways no separable CP rank can.

TPU evaluation: bilinear interpolation is separable per plane, so it is
computed WITHOUT materializing a [N, R^2] four-hot operand:

  t[(k, b), n]  = sum_a P[a, (k, b)] * wa[a, n]     (one MXU matmul/plane)
  out_p[k, n]   = sum_b t[(k, b), n] * wb[b, n]     (VPU multiply-reduce)

where wa/wb are per-axis TWO-HOT rows ((1-frac) at floor, frac at floor+1),
built ONCE per axis and shared by the two planes that use it. Forward and
all backward contractions (dP = wa @ dt^T, dwa = P @ dt, dwb = sum_k t*dout)
are matmuls / dense VPU work — no gathers, no scatters. All large
intermediates keep the big N axis MINOR-most (the repo-wide layout rule; see
ops/hash_encoding.py). Cost per sample is ~K*R^2/N-free matmul FLOPs — at
proposal scale (K<=8, R<=192) this prices at single-digit ms/step on v5e vs
~100-550ms for hash proposals (PERFORMANCE.md round-4 table).

Position gradients are exact (the two-hot weights are differentiable in the
fractional coordinate), so camera-pose gradients flow through triplane
proposals just like CP/exact-hash ones.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

# Axis pairs of the three planes: (contracted axis a, reduced axis b).
# Plane p covers the two axes != p's dropped axis; dropped axes are z, y, x.
_PLANE_AXES = ((0, 1), (0, 2), (1, 2))  # (x,y), (x,z), (y,z)

# Samples per chunk. The large transient is the per-plane [K*R, C] matmul
# output (3 live at once in the worst case); 2^18 samples at K*R = 1024
# is 268M bf16 elements = 537MB per plane. The chunk body is remat'd so the
# transients are rebuilt in the backward instead of residualized across the
# scanned train steps (same rule as ops/lowrank.py / hash encode residuals).
_CHUNK = 1 << 18


def init_triplanes(key: jax.Array, resolution: int, rank: int) -> Array:
    """[3, R, R, K] plane parameters.

    Init ~ 1 + N(0, 0.1): the three plane factors multiply, so (like the CP
    line init, TensoRF-style) products start near 1 with broken symmetry and
    gradients flow to all three planes from step 0.
    """
    return 1.0 + 0.1 * jax.random.normal(
        key, (3, resolution, resolution, rank), jnp.float32
    )


def _twohot_nt(coords: Array, r: int) -> Array:
    """coords [N] in [0, R-1] -> two-hot [R, N] bf16 (N minor-most).

    Differentiable in coords: d/dfrac is (-1) at floor, (+1) at floor+1.
    """
    i0 = jnp.clip(jnp.floor(coords), 0.0, float(r - 2))
    fr = (coords - i0)[None, :].astype(jnp.bfloat16)  # [1, N]
    i0 = i0.astype(jnp.int32)[None, :]  # [1, N]
    ar = jnp.arange(r, dtype=jnp.int32)[:, None]  # [R, 1]
    return jnp.where(ar == i0, 1.0 - fr, 0.0) + jnp.where(ar == i0 + 1, fr, 0.0)


def _triplane_chunk(planes: Array, coords: Array) -> Array:
    """One chunk: planes [3, R, R, K], coords [C, 3] in [0, R-1] -> [C, K]."""
    r, k = planes.shape[1], planes.shape[3]
    # per-axis two-hots, built once and shared by the two planes using them
    w = [_twohot_nt(coords[:, d], r) for d in range(3)]  # 3 x [R, N]
    out = None
    for p, (a, b) in enumerate(_PLANE_AXES):
        # P[a, b, k] -> [a, (k b)] so the matmul output is [(k b), N] with
        # N minor and the b axis contiguous for the reshape below
        pm = jnp.transpose(planes[p], (0, 2, 1)).reshape(r, k * r)
        t = jax.lax.dot_general(
            pm.astype(jnp.bfloat16),
            w[a],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [(k b), N]
        f = jnp.sum(
            t.reshape(k, r, -1) * w[b][None].astype(jnp.float32), axis=1
        )  # [K, N]
        out = f if out is None else out * f
    return out.T  # [C, K]


def triplane_encode(planes: Array, positions: Array) -> Array:
    """K-planes encoding: positions [..., 3] in [0,1]^3 -> [..., K].

    ``planes``: [3, R, R, K]. Features are the Hadamard product of the three
    bilinearly-interpolated plane vectors (see module docstring).
    """
    batch_shape = positions.shape[:-1]
    p = positions.reshape(-1, 3)
    n = p.shape[0]
    r = planes.shape[1]
    coords = jnp.clip(p, 0.0, 1.0) * (r - 1)  # [N, 3]
    body = jax.checkpoint(lambda xc: _triplane_chunk(planes, xc))
    if n <= _CHUNK:
        out = body(coords)
    else:
        pad = (-n) % _CHUNK
        c = jnp.pad(coords, ((0, pad), (0, 0)))
        out = jax.lax.map(body, c.reshape(-1, _CHUNK, 3)).reshape(
            -1, planes.shape[3]
        )[:n]
    return out.reshape(*batch_shape, planes.shape[3])
