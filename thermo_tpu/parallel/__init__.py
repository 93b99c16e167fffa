"""Multi-chip / multi-host parallelism (jax.sharding + pjit).

Replaces the reference's (unused) torch.distributed/NCCL DDP plumbing
(SURVEY §2c) with the TPU-native design: a 1-D ("data",) device mesh over
which ray batches are sharded; parameters are replicated and XLA inserts the
gradient all-reduce over ICI, overlapped with the backward pass by the
latency-hiding scheduler.
"""

from thermo_tpu.parallel.mesh import (
    data_mesh,
    initialize_distributed,
    shard_batch_spec,
)

__all__ = ["data_mesh", "initialize_distributed", "shard_batch_spec"]
