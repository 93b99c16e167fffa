"""Test env: force CPU with 8 virtual devices so multi-chip sharding tests run
anywhere (SURVEY §4: the reference has no distributed tests; we do better).

The session image force-registers a TPU ('axon') PJRT backend from
sitecustomize and exports JAX_PLATFORMS=axon, so env vars alone don't stick —
we must override through jax.config after import, before any device use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound (hundreds of tiny
# XLA programs), and every test re-run recompiles from scratch without it.
jax.config.update("jax_compilation_cache_dir", "/tmp/thermo_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
