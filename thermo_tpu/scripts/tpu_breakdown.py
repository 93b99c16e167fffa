"""Step-time attribution for a METHOD_CONFIGS preset on the real TPU.

Times ablated variants of the flagship train-step computation and prints
each as soon as it is measured (the remote-compile tunnel gives no device
traces, so attribution is by subtraction between end-to-end variants).

Run: python -m thermo_tpu.scripts.tpu_breakdown [--method thermal-nerf-tpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import numpy as np


def timed(fn, *args, reps: int = 3) -> float:
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.ravel(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.ravel(out)[0])  # host fetch = the only reliable sync here
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--method", default="thermal-nerf-tpu")
    ap.add_argument("--rays", type=int, default=4096)
    ap.add_argument("--only", default="", help="comma list of variant names")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/thermo_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from thermo_tpu.configs.methods import METHOD_CONFIGS
    from thermo_tpu.data.cameras import RayBundle
    from thermo_tpu.models.thermal_nerf import ThermoNerfModel

    base_cfg = METHOD_CONFIGS[args.method]().model

    def build(model_cfg):
        model = ThermoNerfModel(model_cfg, ((-1.0,) * 3, (1.0,) * 3), 8)
        return model, model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    n = args.rays
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = RayBundle(
        origins=jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32),
        directions=jnp.asarray(d, jnp.float32),
        camera_indices=jnp.asarray(rng.integers(0, 8, n), jnp.int32),
    )
    gt_rgb = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
    gt_t = jnp.asarray(rng.uniform(0, 1, (n, 1)), jnp.float32)
    key = jax.random.PRNGKey(1)

    def grad_fn(model, flag=0.0):
        def loss(p):
            out = model.forward(
                p, rays, key, step=10000.0, prop_grad_flag=flag, train=True
            )
            total, _ = model.losses(p, out, gt_rgb, gt_t, rng=key)
            return total

        return jax.jit(
            lambda p: jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b), jax.grad(loss)(p), jnp.float32(0)
            )
        )

    def fwd_fn(model, train):
        def f(p):
            out = model.forward(
                p, rays, key if train else None, step=10000.0,
                prop_grad_flag=0.0, train=train,
            )
            return out["rgb"].sum() + out["thermal"].sum()

        return jax.jit(f)

    variants: dict[str, tuple] = {}

    m0 = build(base_cfg)
    variants["fwd_eval"] = (fwd_fn(m0[0], False), m0[1])
    variants["fwd_train"] = (fwd_fn(m0[0], True), m0[1])
    variants["bwd_gated"] = (grad_fn(m0[0], 0.0), m0[1])
    variants["bwd_update"] = (grad_fn(m0[0], 1.0), m0[1])

    # tiny final hash table: isolates the final-field gather/scatter cost
    # (same sample counts, same MLP widths, table fits in VMEM-ish cache)
    m_tiny = build(dataclasses.replace(base_cfg, log2_hashmap_size=10))
    variants["bwd_gated_tinytable"] = (grad_fn(m_tiny[0], 0.0), m_tiny[1])

    # exact 8-corner gradients (vs the preset's stochastic k)
    m_exact = build(dataclasses.replace(base_cfg, hash_grad_corners=0))
    variants["bwd_gated_exactgrad"] = (grad_fn(m_exact[0], 0.0), m_exact[1])

    only = set(filter(None, args.only.split(",")))
    print(f"Attribution ({args.method}, {n} rays):", flush=True)
    for name, (fn, p) in variants.items():
        if only and name not in only:
            continue
        secs = timed(fn, p)
        print(f"  {name:22s} {secs*1e3:8.1f} ms  ({n/secs:,.0f} rays/s)", flush=True)


if __name__ == "__main__":
    main()
