"""Low-rank (CP-factorized) grid encodings evaluated as MXU matmuls.

TPU-native alternative encoding for the proposal density fields (the
reference binds HashMLPDensityField everywhere, nerfstudio
``fields/density_fields.py``; bound at thermal_nerf_model.py:118-149).
The Instant-NGP hash grid is adversarial to TPU hardware: its forward is
~8 random table lookups per (sample, level) and its backward is scatter-adds,
both of which run at ~7-9 ns per index on v5e — far from any compute or
bandwidth roofline. This module replaces the table lookup entirely:

  features_r(x, y, z) = vx[r](x) * vy[r](y) * vz[r](z)          (TensoRF-CP)

with each per-axis line value linearly interpolated. The interpolation is
expressed as a TWO-HOT matrix multiply: for coordinates c with floor i and
fraction f, the row ``W[n] = (1-f) e_{i} + f e_{i+1}`` contracts with the
line table ``V [R, K]`` on the MXU. Both the forward (``W @ V``) and the
parameter gradient (``W^T @ g``) are matmuls — NO gathers, NO scatters.
At proposal-field scale (R <= 256, K <= 32) this is ~2 orders of magnitude
cheaper per sample than the hash-grid path (see kernel_microbench --widths
and PERFORMANCE.md).

Quality: proposal fields only steer hierarchical sampling and are trained to
match the final field's histogram via the interlevel loss; a rank-K CP
density at the same max resolution is an adequate guide (validated by
scripts/quality_ablation.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

# Chunk of samples per two-hot matmul. The [3, CHUNK, R] bf16 two-hot tensor
# is the large transient (<= 3 * 2^17 * 256 * 2B = 200MB); the chunk body is
# remat'd so it is never saved as a residual (rebuilt in backward). Round-3
# trace finding: small chunks (2^15) under lax.map serialized the proposal
# encode behind a 134MB while-loop accumulator carry (~18ms/step); one
# axis-batched dot_general per big chunk runs the same math at MXU rate.
_CHUNK = 1 << 21


def _twohot_chunk(lines: Array, coords: Array) -> Array:
    """One chunk, all 3 axes batched: coords [C, 3] in [0, R-1] ->
    per-axis interpolated features multiplied together, [C, K]."""
    r = lines.shape[1]
    c3 = coords.T  # [3, C]
    i0 = jnp.clip(jnp.floor(c3), 0.0, float(r - 2))
    fr = (c3 - i0)[..., None]  # [3, C, 1]
    i0 = i0.astype(jnp.int32)[..., None]  # [3, C, 1]
    ar = jnp.arange(r, dtype=jnp.int32)[None, None]  # [1, 1, R]
    fr16 = fr.astype(jnp.bfloat16)
    w = jnp.where(ar == i0, 1.0 - fr16, 0.0) + jnp.where(
        ar == i0 + 1, fr16, 0.0
    )  # [3, C, R] two-hot, built directly in bf16
    f3 = jax.lax.dot_general(
        w,
        lines.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),  # batched over axis 0
        preferred_element_type=jnp.float32,
    )  # [3, C, K]
    return f3[0] * f3[1] * f3[2]


def line_interp(lines: Array, coords: Array) -> Array:
    """Linearly interpolate a line table at fractional coordinates via a
    two-hot matmul (single axis; see ``cp_encode`` for the batched path).

    ``lines``: [R, K] parameters. ``coords``: [N] in [0, R-1] (clamped).
    Returns [N, K] f32. Differentiable in both arguments; the parameter
    cotangent lowers to ``W^T @ g`` matmuls (no scatter), the coordinate
    cotangent to a row-difference contraction (no gather).
    """
    r = lines.shape[0]
    i0 = jnp.clip(jnp.floor(coords), 0.0, float(r - 2))
    fr = (coords - i0)[:, None]  # [N, 1]
    i0 = i0.astype(jnp.int32)[:, None]
    ar = jnp.arange(r, dtype=jnp.int32)[None]  # [1, R]
    w = (ar == i0) * (1.0 - fr) + (ar == i0 + 1) * fr  # [N, R]
    return jnp.dot(
        w.astype(jnp.bfloat16),
        lines.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def cp_encode(lines: Array, positions: Array) -> Array:
    """TensoRF-CP encoding: positions [..., 3] in [0,1]^3 -> [..., K].

    ``lines``: [3, R, K] per-axis line tables. The rank-K feature is the
    Hadamard product of the three interpolated per-axis vectors, computed as
    ONE axis-batched two-hot dot_general per chunk of samples.
    """
    batch_shape = positions.shape[:-1]
    p = positions.reshape(-1, 3)
    n = p.shape[0]
    r = lines.shape[1]
    coords = jnp.clip(p, 0.0, 1.0) * (r - 1)  # [N, 3]
    body = jax.checkpoint(lambda xc: _twohot_chunk(lines, xc))
    if n <= _CHUNK:
        out = body(coords)
    else:
        pad = (-n) % _CHUNK
        c = jnp.pad(coords, ((0, pad), (0, 0)))
        out = jax.lax.map(body, c.reshape(-1, _CHUNK, 3)).reshape(
            -1, lines.shape[2]
        )[:n]
    return out.reshape(*batch_shape, lines.shape[2])


def init_cp_lines(key: jax.Array, resolution: int, rank: int) -> Array:
    """[3, R, K]; init ~ N(0, 0.2) + 1 so rank products start near 1 with
    broken symmetry (TensoRF-style positive-mean line init)."""
    return 1.0 + 0.2 * jax.random.normal(key, (3, resolution, rank), jnp.float32)
