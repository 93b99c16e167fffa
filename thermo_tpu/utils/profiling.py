"""Profiling helpers.

The reference inherits nerfstudio's timing writer (Train Iter (time),
Train Rays / Sec, ETA — SURVEY §5). Here: the trainer logs rays/s at every
sync point, and this module adds a jax.profiler trace context for capturing
XLA/TPU traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: Path | str = "/tmp/thermo_tpu_trace"):
    """Capture a jax.profiler trace around a block."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock timer that synchronizes via a host fetch of a device scalar
    (block_until_ready is not reliable on tunneled TPU runtimes)."""

    def __init__(self):
        self.t0 = time.perf_counter()

    def elapsed(self, sync_value=None) -> float:
        if sync_value is not None:
            float(jax.numpy.ravel(sync_value)[0])
        return time.perf_counter() - self.t0
