"""Two-process ``jax.distributed`` execution test.

SURVEY §2c: the reference's multi-machine story is an unused nerfstudio
MachineConfig (`machine:` block in tests/data/vanilla_nerf/.../config.yml,
torch.distributed/NCCL underneath, never exercised by any config or test).
The TPU framework's equivalent is ``jax.distributed.initialize`` + a global
mesh; this test actually RUNS it: two OS processes, a local coordinator, two
virtual CPU devices per process, one data-parallel gradient step whose
all-reduce crosses the process boundary (Gloo collectives on CPU — the same
XLA partitioning that rides ICI/DCN on a real pod slice).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

WORKER = Path(__file__).parent / "_multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_grad_step():
    port = _free_port()
    env = dict(os.environ)
    env.update(
        PYTHONPATH=str(Path(__file__).parent.parent),
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(port), str(pid)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    for pid, out in enumerate(outs):
        assert f"OK process={pid}" in out, out
