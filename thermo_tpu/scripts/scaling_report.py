"""Multi-device scaling-efficiency report (BASELINE.json config #5).

Measures train-step throughput (rays/s) for device counts 1..N on the
available platform and reports parallel efficiency vs the single-device
run with a proportionally scaled global batch (weak scaling — rays per
device held constant). On a real pod slice run under
``jax.distributed.initialize``; on a dev box use
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
to exercise the sharding path.
"""

from __future__ import annotations

import dataclasses
import json
import time
from typing import Optional

import numpy as np

from thermo_tpu.utils.cli import parse_cli


@dataclasses.dataclass
class ScalingParameters:
    """Measure data-parallel scaling efficiency of the train step."""

    rays_per_device: int = 2048
    steps_per_call: int = 5
    calls: int = 4
    tiny: bool = True  # tiny model (fast); False = full thermal-nerf config
    output: Optional[str] = None  # write JSON report here


def _setup(rays_per_batch: int, tiny: bool):
    import dataclasses as dc

    from thermo_tpu.configs.methods import (
        thermal_nerf_config,
        thermal_nerf_tiny_config,
    )
    from thermo_tpu.data.cameras import Cameras
    from thermo_tpu.models.thermal_nerf import ProposalNetArgs

    cfg = thermal_nerf_tiny_config() if tiny else thermal_nerf_config()
    cfg.train_num_rays_per_batch = rays_per_batch
    if tiny:
        cfg.model = dc.replace(
            cfg.model,
            num_levels=4, max_res=64, log2_hashmap_size=12,
            num_proposal_samples_per_ray=(32, 16), num_nerf_samples_per_ray=12,
            proposal_net_args_list=(
                ProposalNetArgs(num_levels=2, max_res=32, log2_hashmap_size=10, hidden_dim=8),
            ) * 2,
            far_plane=6.0,
        )
    n, size = 8, 64
    rng = np.random.default_rng(0)
    c2w = np.tile(np.eye(4)[:3], (n, 1, 1)).astype(np.float32)
    c2w[:, 2, 3] = 2.0
    cameras = Cameras.from_numpy(
        fx=np.full(n, 60.0), fy=np.full(n, 60.0),
        cx=np.full(n, size / 2), cy=np.full(n, size / 2),
        width=np.full(n, size), height=np.full(n, size), c2w=c2w,
    )
    images = rng.integers(0, 255, (n, size, size, 3), dtype=np.uint8)
    thermal = rng.integers(0, 255, (n, size, size, 1), dtype=np.uint8)
    return cfg, cameras, images, thermal


def main(p: ScalingParameters) -> None:
    import jax

    from thermo_tpu.engine.trainer import Trainer
    from thermo_tpu.models.thermal_nerf import ThermoNerfModel
    from thermo_tpu.parallel.mesh import data_mesh

    devices = jax.devices()
    counts = [c for c in (1, 2, 4, 8, 16, 32) if c <= len(devices)]
    results = []
    for c in counts:
        cfg, cameras, images, thermal = _setup(p.rays_per_device * c, p.tiny)
        cfg.steps_per_jit_loop = p.steps_per_call
        mesh = data_mesh(devices[:c]) if c > 1 else None
        model = ThermoNerfModel(cfg.model, ((-1.0,) * 3, (1.0,) * 3), 8)
        trainer = Trainer(cfg, model, cameras, images, thermal, mesh=mesh)

        def run():
            # state buffers are donated by the jitted step: persist the
            # returned state on the trainer across calls
            for _ in range(p.calls):
                trainer.state, metrics = trainer.train_steps(
                    trainer.state, trainer.images, trainer.thermal, trainer.cameras
                )
            return float(metrics["total_loss"])  # sync

        if mesh is not None:
            with mesh:
                run()  # compile+warmup
                t0 = time.perf_counter()
                run()
                dt = time.perf_counter() - t0
        else:
            run()
            t0 = time.perf_counter()
            run()
            dt = time.perf_counter() - t0
        rays = cfg.train_num_rays_per_batch * p.steps_per_call * p.calls
        rps = rays / dt
        results.append({"devices": c, "rays_per_sec": rps})
        base = results[0]["rays_per_sec"]
        eff = rps / (base * c)
        results[-1]["efficiency_vs_1dev"] = eff
        results[-1]["throughput_vs_1dev"] = rps / base
        print(
            f"devices={c}: {rps:,.0f} rays/s  efficiency={eff:.2%}", flush=True
        )

    platform = jax.devices()[0].platform
    report = {"platform": platform, "results": results}
    if platform == "cpu":
        report["note"] = (
            "virtual CPU devices share one physical host: every mesh size "
            "runs on the same cores, so linear weak scaling is physically "
            "impossible and efficiency_vs_1dev is NOT meaningful here. This "
            "run validates the sharding/collective MECHANISM; the ceiling "
            "is flat total throughput (throughput_vs_1dev ~= 1.0). Real "
            "scaling numbers require a multi-chip slice."
        )
    print(json.dumps(report))
    if p.output:
        with open(p.output, "w") as f:
            json.dump(report, f, indent=2)


def cli() -> None:
    from thermo_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    main(parse_cli(ScalingParameters))


if __name__ == "__main__":
    cli()
