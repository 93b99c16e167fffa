"""Honor JAX_PLATFORMS for CLI entry points.

Some TPU images register a PJRT plugin from sitecustomize in a way that
overrides the ``JAX_PLATFORMS`` environment variable. Calling this first in
every CLI main restores the expected env-var contract (e.g.
``JAX_PLATFORMS=cpu thermo-tpu-train --tiny ...`` for the CPU-runnable
config)."""

from __future__ import annotations

import os


def apply_env_platform() -> None:
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        import jax

        jax.config.update("jax_platforms", platforms)
    enable_persistent_compile_cache()
    maybe_initialize_distributed()


def maybe_initialize_distributed() -> None:
    """Multi-host init from the environment, honored by every CLI entry
    point: set THERMO_TPU_COORDINATOR (host:port), THERMO_TPU_NUM_PROCESSES
    and THERMO_TPU_PROCESS_ID on each host to launch a jax.distributed
    training job (the TPU-native replacement for nerfstudio's MachineConfig
    dist_url/num_machines/machine_rank block; SURVEY §2c). On Cloud TPU
    pods, leave unset — JAX auto-initializes from the TPU metadata."""
    addr = os.environ.get("THERMO_TPU_COORDINATOR")
    nproc = os.environ.get("THERMO_TPU_NUM_PROCESSES")
    if addr and nproc and int(nproc) > 1:
        from thermo_tpu.parallel.mesh import initialize_distributed

        initialize_distributed(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(os.environ.get("THERMO_TPU_PROCESS_ID", "0")),
        )


def enable_persistent_compile_cache() -> None:
    """Cache compiled executables across processes (full-scale train-step
    compiles take minutes through the remote-compile tunnel; repeated CLI
    invocations at identical shapes then load in seconds)."""
    import jax

    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/thermo_tpu_jax_cache"
    )
    if cache_dir:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
