"""Step-time breakdown at full thermal-nerf scale on the real TPU.

Times ablated variants of the train step to attribute where the ~1s/step
goes (jax.profiler device traces are unavailable through the remote-compile
tunnel, so this uses subtraction between end-to-end variants):

  fwd_eval          forward, train=False (no aux, eval path)
  fwd_train         forward, train=True (sampler jitter + aux)
  bwd_full_gated    value_and_grad(total loss), prop_grad_flag=0 (the 4/5 regime)
  bwd_full_update   value_and_grad(total loss), prop_grad_flag=1 (the 1/5 regime)
  bwd_rgbonly_gated value_and_grad(rgb+thermal MSE only), flag=0
  fwd_nohash        forward with hash tables stop-gradient'd and zeroed
                    contributions are NOT removable, so instead: tiny-table
                    model of the same sample counts (isolates non-hash cost)

Run: python -m thermo_tpu.scripts.step_breakdown [--grad-corners K]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _sync(x) -> float:
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


def timed(fn, *args, reps: int = 3) -> float:
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--grad-corners", type=int, default=0)
    ap.add_argument("--prop-fwd-corners", type=int, default=0)
    ap.add_argument("--rays", type=int, default=4096)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from thermo_tpu.data.cameras import RayBundle
    from thermo_tpu.models.thermal_nerf import ModelConfig, ThermoNerfModel

    def build(model_cfg):
        model = ThermoNerfModel(model_cfg, ((-1.0,) * 3, (1.0,) * 3), 8)
        params = model.init_params(jax.random.PRNGKey(0))
        return model, params

    cfg = ModelConfig(
        hash_grad_corners=args.grad_corners,
        proposal_fwd_corners=args.prop_fwd_corners,
    )
    model, params = build(cfg)

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

    results = {}

    def record(name, secs):
        results[name] = secs
        print(f"  {name:24s} {secs*1e3:9.1f} ms  ({n/secs:,.0f} rays/s)", flush=True)

    print(f"Breakdown ({n} rays, grad_corners={args.grad_corners}, "
          f"prop_fwd_corners={args.prop_fwd_corners}):", flush=True)

    @jax.jit
    def fwd_eval(p):
        out = model.forward(p, rays, None, train=False)
        return out["rgb"].sum() + out["thermal"].sum()

    record("fwd_eval", timed(fwd_eval, params))

    @jax.jit
    def fwd_train(p):
        out = model.forward(p, rays, key, step=10000.0, prop_grad_flag=0.0, train=True)
        return out["rgb"].sum() + out["thermal"].sum()

    record("fwd_train", timed(fwd_train, params))

    def make_loss(flag, full):
        def loss(p):
            out = model.forward(
                p, rays, key, step=10000.0, prop_grad_flag=flag, train=True
            )
            if full:
                total, _ = model.losses(p, out, gt_rgb, gt_t, rng=key)
                return total
            return (
                jnp.mean((out["rgb"] - gt_rgb) ** 2)
                + jnp.mean((out["thermal"] - gt_t) ** 2)
            )
        return loss

    for name, flag, full in (
        ("bwd_full_gated", 0.0, True),
        ("bwd_full_update", 1.0, True),
        ("bwd_rgbonly_gated", 0.0, False),
    ):
        g = jax.jit(lambda p, _f=jax.grad(make_loss(flag, full)): _f(p)["fields"]["grid"]["table"].sum())
        record(name, timed(g, params))

    # non-hash floor: same sample counts, trivially small tables
    tiny = dataclasses.replace(
        cfg,
        num_levels=2,
        log2_hashmap_size=6,
        max_res=32,
        proposal_net_args_list=tuple(
            dataclasses.replace(a, num_levels=2, log2_hashmap_size=6, max_res=32)
            for a in cfg.proposal_net_args_list
        ),
    )
    model_t, params_t = build(tiny)

    def loss_t(p):
        out = model_t.forward(
            p, rays, key, step=10000.0, prop_grad_flag=1.0, train=True
        )
        total, _ = model_t.losses(p, out, gt_rgb, gt_t, rng=key)
        return total

    g_t = jax.jit(lambda p: jax.grad(loss_t)(p)["fields"]["grid"]["table"].sum())
    record("bwd_tinytable_update", timed(g_t, params_t))


if __name__ == "__main__":
    main()
