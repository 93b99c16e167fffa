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


def auto_mesh(
    batch_size: int,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Optional[Mesh]:
    """Production-trainer mesh: all visible devices, or None on one device.

    Used by the train CLI (scripts/train_eval.py) so ``thermo-tpu-train``
    trains sharded whenever >1 chip is visible — the TPU-native counterpart
    of the reference plumbing world_size through its pipeline
    (pipeline_tracking.py:27-28) without ever using it.

    ``model_parallel`` > 1 builds the 2-D ("data","model") mesh sharding the
    [F, L*T] hash tables. The device count is trimmed (never padded) to the
    largest multiple of ``model_parallel`` whose data axis divides
    ``batch_size``, so the ray shards stay equal-sized.
    """
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    mp = max(1, int(model_parallel))
    if n <= 1:
        if mp > 1:
            # an explicit model-parallel request must not silently fall back
            # to single-chip training
            raise ValueError(
                f"model_parallel={mp} requested but only {n} device visible"
            )
        return None
    if mp > n:
        raise ValueError(
            f"model_parallel={mp} exceeds the {n} visible devices"
        )
    use = n - (n % mp)
    while use >= mp and batch_size % max(use // mp, 1):
        use -= mp
    if use <= 1 or (mp > 1 and use < mp):
        if mp > 1:
            raise ValueError(
                f"model_parallel={mp} cannot be satisfied: no multiple of it "
                f"within {n} devices divides batch_size={batch_size}"
            )
        return None
    if mp > 1:
        return data_model_mesh(mp, devs[:use])
    return data_mesh(devs[:use])


def data_model_mesh(
    model_axis: int, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """2-D ("data", "model") mesh: the optional hash-table sharding axis
    (SURVEY §2c). ``model_axis`` divides the device count; rays shard over
    "data" and the [F, L*T] hash tables shard their flat entry axis over
    "model" (see ``shard_params_for_mesh``)."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    if devs.size % model_axis:
        raise ValueError(
            f"model_axis={model_axis} must divide device count {devs.size}"
        )
    return Mesh(
        devs.reshape(devs.size // model_axis, model_axis),
        axis_names=("data", "model"),
    )


def shard_batch_spec(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard axis 0 (rays) over "data", replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def table_spec(mesh: Mesh) -> NamedSharding:
    """Sharding for a [F, L*T] hash table: entries split over "model"."""
    return NamedSharding(mesh, P(None, "model"))


def _is_table_path(path) -> bool:
    return any(
        getattr(p, "key", getattr(p, "name", None)) == "table" for p in path
    )


def shard_params_for_mesh(mesh: Mesh, tree):
    """Place a params-shaped pytree (params, grads, or optimizer moments)
    on ``mesh``: hash-table leaves (dict key ``"table"``, shape [F, L*T])
    shard their entry axis over the "model" axis when present and evenly
    divisible; everything else is replicated. XLA then partitions the
    forward gather / backward scatter over the table shards and inserts the
    reduce-scatter/all-gather collectives itself."""
    has_model = "model" in mesh.axis_names and mesh.shape.get("model", 1) > 1
    model_size = mesh.shape.get("model", 1)

    def place(path, leaf):
        if (
            has_model
            and _is_table_path(path)
            and getattr(leaf, "ndim", 0) == 2
            and leaf.shape[1] % model_size == 0
        ):
            return jax.device_put(leaf, table_spec(mesh))
        return jax.device_put(leaf, replicated(mesh))

    return jax.tree_util.tree_map_with_path(place, tree)
