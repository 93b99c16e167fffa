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
