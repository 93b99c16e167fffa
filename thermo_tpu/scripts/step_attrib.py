"""Honest full-train-step attribution by config-variant deltas.

Measures the REAL jitted train step (same machinery as bench.py: Trainer,
steps_per_jit_loop=10, one host fetch per 10 steps so tunnel RTT amortizes)
across config variants, and attributes step time to components by
subtraction. The per-op microbench scripts time isolated kernels; this one
times components in situ, with XLA fusion/overlap included.

Run: python -m thermo_tpu.scripts.step_attrib [--variants a,b,c]
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import numpy as np


def build_trainer(cfg):
    import jax.numpy as jnp

    from thermo_tpu.data.cameras import Cameras
    from thermo_tpu.engine.trainer import Trainer
    from thermo_tpu.models.thermal_nerf import ThermoNerfModel

    num_cameras, h, w = 16, 480, 640
    rng = np.random.default_rng(0)
    c2w = np.tile(np.eye(4)[:3], (num_cameras, 1, 1)).astype(np.float32)
    angles = np.linspace(0, 2 * np.pi, num_cameras, endpoint=False)
    c2w[:, 0, 3] = 1.5 * np.cos(angles)
    c2w[:, 1, 3] = 1.5 * np.sin(angles)
    c2w[:, 2, 3] = 0.5
    cameras = Cameras.from_numpy(
        fx=np.full(num_cameras, 500.0), fy=np.full(num_cameras, 500.0),
        cx=np.full(num_cameras, w / 2), cy=np.full(num_cameras, h / 2),
        width=np.full(num_cameras, w), height=np.full(num_cameras, h),
        c2w=c2w,
    )
    images = rng.integers(0, 255, (num_cameras, h, w, 3), dtype=np.uint8)
    thermal = rng.integers(0, 255, (num_cameras, h, w, 1), dtype=np.uint8)
    model = ThermoNerfModel(cfg.model, ((-1.0,) * 3, (1.0,) * 3), num_cameras)
    trainer = Trainer(cfg, model, cameras, images, thermal)
    trainer.state = dataclasses.replace(
        trainer.state, step=jnp.asarray(10_000, jnp.int32)
    )
    return trainer


def measure(trainer, n_calls: int = 3) -> float:
    """ms per TRAIN STEP (steps_per_jit_loop amortized, post-warmup)."""
    state = trainer.state
    state, metrics = trainer.train_steps(
        state, trainer.images, trainer.thermal, trainer.cameras
    )
    assert np.isfinite(float(metrics["total_loss"]))
    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, metrics = trainer.train_steps(
            state, trainer.images, trainer.thermal, trainer.cameras
        )
    _ = float(metrics["total_loss"])
    dt = time.perf_counter() - t0
    return dt / (n_calls * trainer.config.steps_per_jit_loop) * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="")
    ap.add_argument("--method", default="thermal-nerf-tpu")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/thermo_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from thermo_tpu.configs.methods import METHOD_CONFIGS
    from thermo_tpu.models.thermal_nerf import ProposalNetArgs

    def cfg_for(**model_overrides):
        cfg = METHOD_CONFIGS[args.method]()
        cfg.steps_per_jit_loop = 10
        rays = model_overrides.pop("_rays", None)
        if rays:
            cfg.train_num_rays_per_batch = rays
        if model_overrides:
            cfg.model = dataclasses.replace(cfg.model, **model_overrides)
        return cfg

    variants: dict[str, dict] = {
        "base": {},
        # final-field cost scale: tiny table -> near-free gather/scatter
        "final_table_2^10": dict(log2_hashmap_size=10),
        # final sample count sensitivity
        "final_samples_24": dict(num_nerf_samples_per_ray=24),
        # scatter scale: exact 8-corner grads vs k=1
        "grad_corners_0": dict(hash_grad_corners=0),
        # proposal cost scale
        "prop_samples_half": dict(num_proposal_samples_per_ray=(128, 48)),
        "prop_hash": dict(
            proposal_net_args_list=(
                ProposalNetArgs(max_res=128),
                ProposalNetArgs(max_res=256),
            )
        ),
        "prop_hash_stoch2": dict(
            proposal_fwd_corners=2,
            proposal_net_args_list=(
                ProposalNetArgs(max_res=128),
                ProposalNetArgs(max_res=256),
            ),
        ),
        # no camera optimizer (ray-gen + pose-grad cost)
        "camera_opt_off": dict(camera_optimizer_mode="off"),
        # stochastic-trilinear FORWARD on the final field (train only)
        "final_fwd_stoch_1": dict(hash_fwd_corners=1),
        "final_fwd_stoch_2": dict(hash_fwd_corners=2),
        # ---- round 2: decompose the stoch-1 regime ----
        "stoch1_table_2^10": dict(hash_fwd_corners=1, log2_hashmap_size=10),
        "stoch1_samples_24": dict(hash_fwd_corners=1, num_nerf_samples_per_ray=24),
        "stoch1_no_interlevel": dict(hash_fwd_corners=1, interlevel_loss_mult=0.0),
        "stoch1_no_distortion": dict(hash_fwd_corners=1, distortion_loss_mult=0.0),
        "stoch1_rays_8192": dict(hash_fwd_corners=1, _rays=8192),
        "stoch1_rays_16384": dict(hash_fwd_corners=1, _rays=16384),
        # ---- round 3: level-subsampled table gradients ----
        "stoch1_gl2": dict(hash_fwd_corners=1, hash_grad_levels=2),
        "stoch1_gl1": dict(hash_fwd_corners=1, hash_grad_levels=1),
        "gc1_gl2": dict(hash_grad_corners=1, hash_grad_levels=2),
        "stoch1_gl2_table_2^10": dict(
            hash_fwd_corners=1, hash_grad_levels=2, log2_hashmap_size=10
        ),
        "stoch1_gl2_rays_16384": dict(
            hash_fwd_corners=1, hash_grad_levels=2, _rays=16384
        ),
        # ---- round 4: decompose the remaining non-table cost ----
        "stoch1_gl2_prop_half": dict(
            hash_fwd_corners=1, hash_grad_levels=2,
            num_proposal_samples_per_ray=(128, 48),
        ),
        "stoch1_gl2_s24": dict(
            hash_fwd_corners=1, hash_grad_levels=2, num_nerf_samples_per_ray=24
        ),
        "stoch1_gl2_noil": dict(
            hash_fwd_corners=1, hash_grad_levels=2, interlevel_loss_mult=0.0
        ),
        "stoch1_gl2_nodist": dict(
            hash_fwd_corners=1, hash_grad_levels=2, distortion_loss_mult=0.0
        ),
        "stoch1_gl2_rank16": dict(
            hash_fwd_corners=1, hash_grad_levels=2,
            proposal_net_args_list=(
                ProposalNetArgs(kind="cp", max_res=128, rank=16),
                ProposalNetArgs(kind="cp", max_res=256, rank=16),
            ),
        ),
    }

    # ---- round 4: triplane (K-planes) proposal fields — the non-separable
    # matmul encoding targeting the CP quality ceiling (ops/triplane.py);
    # FLOPs scale with rank * res^2, so sweep both.
    def tri(res, rank):
        return ProposalNetArgs(kind="triplane", max_res=res, rank=rank)

    for name, (res1, res2, rank) in {
        "prop_tri_64_128_k8": (64, 128, 8),
        "prop_tri_128_192_k4": (128, 192, 4),
        "prop_tri_128_192_k8": (128, 192, 8),
        "prop_tri_128_256_k8": (128, 256, 8),
        "prop_tri_128_192_k16": (128, 192, 16),
    }.items():
        variants[name] = dict(
            proposal_net_args_list=(tri(res1, rank), tri(res2, rank))
        )
    only = set(filter(None, args.variants.split(",")))

    for name, ov in variants.items():
        if only and name not in only:
            continue
        trainer = build_trainer(cfg_for(**ov))
        ms = measure(trainer)
        rays = trainer.config.train_num_rays_per_batch
        print(f"  {name:20s} {ms:7.2f} ms/step ({rays/ms*1e3:,.0f} rays/s)",
              flush=True)


if __name__ == "__main__":
    main()
