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
    """
    batch_shape = positions.shape[:-1]
    p = positions.reshape(-1, 3).T  # [3, N]

    scales = jnp.asarray(spec.scales, dtype=jnp.float32)  # [L]
    # tcnn: pos = p * scale + 0.5
    scaled = scales[:, None, None] * p[None, :, :] + 0.5  # [L, 3, N]
    floor = jnp.floor(scaled)
    frac = scaled - floor  # [L, 3, N]
    base = floor.astype(jnp.int32)

    corners = jnp.asarray(_CORNERS)  # [8, 3]
    # [L, 8, 3, N]
    grid_coords = base[:, None, :, :] + corners[None, :, :, None]
    idx = _corner_indices_cf(spec, grid_coords)  # [L, 8, N]

    # Flatten level axis into the table for one fused gather.
    level_offset = (
        jnp.arange(spec.num_levels, dtype=jnp.int32)[:, None, None] * spec.table_size
    )
    flat_idx = idx + level_offset  # [L, 8, N]
    flat_table_t = table.reshape(-1, spec.features_per_level).T  # [F, L*T]
    feats = jnp.take(flat_table_t, flat_idx, axis=1)  # [F, L, 8, N]

    # Trilinear weights: prod over dims of frac/(1-frac) chosen by corner bit.
    cf = corners.astype(frac.dtype)  # [8, 3]
    w = jnp.prod(
        jnp.where(
            cf[None, :, :, None] == 1, frac[:, None, :, :], 1.0 - frac[:, None, :, :]
        ),
        axis=2,
    )  # [L, 8, N]

    out = jnp.sum(feats * w[None].astype(feats.dtype), axis=2)  # [F, L, N]
    # [F, L, N] -> [N, L, F] -> [N, L*F]
    out = jnp.transpose(out, (2, 1, 0)).reshape(*batch_shape, spec.out_dim)
    return out
