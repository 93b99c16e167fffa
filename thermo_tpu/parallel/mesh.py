"""Device mesh construction + sharding specs.

Design (per the standard TPU scaling recipe — pick a mesh, annotate
shardings, let XLA insert collectives):

  * Mesh: 1-D ``("data",)`` over all chips (multi-host: all chips of the
    slice; ``jax.distributed.initialize`` first). Rays are embarrassingly
    parallel; the only cross-device communication is the gradient
    all-reduce, which XLA lowers to ICI-ring all-reduces overlapped with
    the backward composite pass.
  * Parameters (hash tables + MLPs, ~20M params ~80MB fp32) are replicated:
    far below HBM limits, so sharding the 2^19-entry tables (a
    ``("data","model")`` mesh) is unnecessary at this scale; the hooks here
    accept an optional model axis for when grids grow.
  * Per-host data: each host holds the full (small) image stack; the pixel
    sampler draws the global batch deterministically from the shared PRNG
    key, and the batch is sharded by the ``with_sharding_constraint`` in the
    train step, so each chip computes a disjoint ray shard.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host init (jax.distributed). No-op on single-process setups
    unless coordinates are provided explicitly or via the standard TPU env."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def data_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D ("data",) mesh over the given (default: all) devices."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, axis_names=("data",))


def shard_batch_spec(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (rays) over "data", replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
