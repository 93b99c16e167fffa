"""Quality ablation: exact trilinear vs the TPU stochastic-corner estimators.

Trains the SAME full-scale thermal-nerf model (16x2^19 hash grid, 256/96
proposal + 48 final samples) on the synthetic ThermoScenes-style sphere
scene (thermo_scenes_tpu.synthetic) under each estimator configuration and
reports the evaluator metrics side by side, so every claim in
PERFORMANCE.md about the ``thermal-nerf-tpu`` preset's quality is a measured
number, not an assertion.

Run (real TPU):
    python -m thermo_tpu.scripts.quality_ablation --iterations 2000

Writes ``ablation.json`` into the output folder and prints a table.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

from thermo_tpu.utils.cli import parse_cli


@dataclasses.dataclass
class AblationParameters:
    output: Path = Path("./outputs/quality_ablation")
    iterations: int = 2000
    image_size: int = 128
    num_train: int = 24
    num_eval: int = 4
    # comma-separated variant list:
    #   name=grad_corners/prop_fwd_corners[/hash_fwd_corners[/grad_levels]][@method]
    # e.g. "exact=0/0,tpu=1/0/0@thermal-nerf-tpu" ablates the full TPU
    # preset (CP proposals + stochastic knobs) against the exact baseline.
    variants: str = "exact=0/0,gc2=2/0,tpu=2/2"
    # eval-batch cadence during training (the eval-loss TRAJECTORY is the
    # overfit/non-overfit evidence; 250 costs a fast-stepping variant ~2%
    # of a 420 s budget and gives slow variants >= 1 point per run)
    steps_per_eval_batch: int = 250
    # iso-WALL-CLOCK mode: > 0 trains every variant for this many seconds
    # (post-compile device time, Trainer.train max_seconds) instead of a
    # fixed iteration count — the fair comparison for throughput knobs that
    # trade per-step quality for step rate (VERDICT r2 weak #2).
    iso_seconds: float = 0.0
    # synthetic scene variant: sphere | cold | multi | rich | coldrich
    # (round-4 verdict item 5: promotion decisions must cite more than one
    # scene; round-5 item 1: data-rich regimes). cold/coldrich wire
    # cold=True through training AND the inverted Otsu mask through eval;
    # rich/coldrich interleave the eval views over the camera ring.
    scene_variant: str = "sphere"


def main(params: AblationParameters) -> dict:
    from thermo_scenes_tpu.synthetic import _VARIANTS, make_synthetic_scene
    from thermo_tpu.scripts import train_eval as te

    out_root = Path(params.output)
    out_root.mkdir(parents=True, exist_ok=True)
    scene = make_synthetic_scene(
        out_root / "scene",
        num_train=params.num_train,
        num_eval=params.num_eval,
        size=params.image_size,
        variant=params.scene_variant,
        interleave_eval=params.scene_variant in ("rich", "coldrich"),
    )
    cold = _VARIANTS[params.scene_variant][1]

    results: dict[str, dict] = {}
    for spec in params.variants.split(","):
        name, knobs = spec.split("=")
        method = None
        if "@" in knobs:
            knobs, method = knobs.split("@")
        parts = [int(x) for x in knobs.split("/")]
        gc, pf = parts[0], parts[1]
        ff = parts[2] if len(parts) > 2 else 0
        gl = parts[3] if len(parts) > 3 else 0
        print(f"=== variant {name}: hash_grad_corners={gc} "
              f"proposal_fwd_corners={pf} hash_fwd_corners={ff} "
              f"hash_grad_levels={gl} method={method or 'thermal-nerf'}",
              flush=True)
        iso = params.iso_seconds > 0
        run_params = te.TrainingParameters(
            experiment_name=f"ablation-{name}",
            model_output_folder=out_root / name,
            metrics_output_folder=out_root / name / "metrics",
            data=scene,
            max_num_iterations=1_000_000 if iso else params.iterations,
            method=method,
            hash_grad_corners=gc,
            proposal_fwd_corners=pf,
            hash_fwd_corners=ff,
            hash_grad_levels=gl,
            max_seconds=params.iso_seconds if iso else None,
            cold=cold,
            steps_per_eval_batch=params.steps_per_eval_batch,
        )
        exp_dir = te.main(run_params)
        metrics = json.loads(
            (out_root / name / "metrics" / "metrics.json").read_text()
        )
        results[name] = {
            k: v for k, v in metrics["results"].items() if k.endswith("_mean")
        }
        # record how far each variant got (iso-wall-clock evidence)
        try:
            last = (exp_dir / "train_metrics.jsonl").read_text().strip()
            results[name]["trained_steps"] = json.loads(
                last.rsplit("\n", 1)[-1]
            )["step"]
        except (OSError, KeyError, json.JSONDecodeError, IndexError):
            pass
        if iso:
            results[name]["iso_seconds"] = params.iso_seconds

    (out_root / "ablation.json").write_text(json.dumps(results, indent=2))
    keys = sorted({k for r in results.values() for k in r})
    header = "metric".ljust(28) + "".join(n.rjust(14) for n in results)
    print("\n" + header)
    for k in keys:
        row = k.ljust(28) + "".join(
            f"{results[n].get(k, float('nan')):14.4f}" for n in results
        )
        print(row)
    return results


def cli() -> None:
    from thermo_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    main(parse_cli(AblationParameters))


if __name__ == "__main__":
    cli()
