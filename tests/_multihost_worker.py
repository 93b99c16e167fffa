"""Two-process ``jax.distributed`` worker (driven by tests/test_multihost.py).

Exercises the real multi-host code path the reference only stubs (nerfstudio
MachineConfig `machine:` block, tests/data/vanilla_nerf/.../config.yml):
``initialize_distributed`` -> global ("data",) mesh spanning both processes
-> one data-parallel gradient step on a process-local shard of a global
batch, with the gradient all-reduce inserted by XLA across the process
boundary. Asserts the result matches a host-side numpy oracle computed on
the FULL batch, i.e. the cross-process collective really ran.

Usage: python tests/_multihost_worker.py <coordinator_port> <process_id>
(parent sets JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count=2).
"""

from __future__ import annotations

import sys


def main() -> None:
    port, pid = sys.argv[1], int(sys.argv[2])

    from thermo_tpu.parallel.mesh import data_mesh, initialize_distributed

    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 2, jax.local_device_count()
    assert jax.device_count() == 4, jax.device_count()

    mesh = data_mesh()  # global 4-device ("data",) mesh over both processes

    # global batch [8, 4]; each process holds its own half (per-host data
    # loading: disjoint ray shards, SURVEY §2c)
    global_x = np.arange(8 * 4, dtype=np.float32).reshape(8, 4) / 10.0
    local = global_x[pid * 4 : (pid + 1) * 4]
    sharding = NamedSharding(mesh, P("data", None))
    x = jax.make_array_from_process_local_data(sharding, local, global_x.shape)
    w = jnp.full((4,), 0.5, jnp.float32)

    @jax.jit
    def sgd_step(w, x):
        loss = lambda w: jnp.mean(jnp.square(x @ w))
        return w - 0.01 * jax.grad(loss)(w)

    w2 = np.asarray(jax.device_get(sgd_step(w, x)))

    # numpy oracle on the FULL global batch
    w0 = np.full((4,), 0.5, np.float32)
    r = global_x @ w0
    grad = (2.0 / r.size) * (global_x.T @ r)
    np.testing.assert_allclose(w2, w0 - 0.01 * grad, rtol=1e-6)
    print(f"OK process={pid}", flush=True)


if __name__ == "__main__":
    main()
