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
