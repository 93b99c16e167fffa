"""Summarize a quality_ablation output root: final metrics per variant plus
the in-training eval-batch TRAJECTORY (minimum location vs end of run).

The trajectory answer is the round-5 promotion-logic evidence (VERDICT r4
item 1): on the 24-view scenes the eval thermal MSE bottoms out mid-run
(overfit wall, outputs/qa_r4/iso1800); a data-rich regime must show NO
interior minimum — i.e. the last eval is (within tolerance) the best.

Run: python -m thermo_tpu.scripts.qa_summary outputs/qa_r5/rich [...]
Prints one table per root and a JSON line per variant.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def trajectory(run_dir: Path) -> list[tuple[int, float]]:
    """(step, eval_thermal) points from train_metrics.jsonl (any depth)."""
    points = []
    for jl in sorted(run_dir.rglob("train_metrics.jsonl")):
        for line in jl.read_text().splitlines():
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            m = d.get("metrics", d)
            key = "eval_thermal" if "eval_thermal" in m else "eval_rgb_loss"
            if key in m:
                points.append((int(d["step"]), float(m[key])))
    return sorted(points)


def summarize_root(root: Path) -> dict:
    out = {}
    ab = root / "ablation.json"
    results = json.loads(ab.read_text()) if ab.exists() else {}
    variants = list(results) or [
        p.name for p in root.iterdir() if (p / "metrics" / "metrics.json").exists()
    ]
    if not variants and (root / "metrics" / "metrics.json").exists():
        # a single train_eval experiment root (metrics-output-folder layout:
        # root/metrics/metrics.json + root/<experiment>/<method>/
        # train_metrics.jsonl) rather than a quality_ablation root
        row = {
            k: v
            for k, v in json.loads(
                (root / "metrics" / "metrics.json").read_text()
            )["results"].items()
            if k.endswith("_mean")
        }
        pts = trajectory(root)
        if pts:
            steps, vals = zip(*pts)
            i_min = vals.index(min(vals))
            row.update(
                eval_points=len(pts), eval_min_step=steps[i_min],
                eval_last_step=steps[-1], eval_min=vals[i_min],
                eval_last=vals[-1],
                interior_minimum=bool(
                    steps[i_min] < steps[-1] and vals[-1] > vals[i_min] * 1.10
                ),
            )
        return {root.name: row}
    for name in variants:
        row = dict(results.get(name, {}))
        mj = root / name / "metrics" / "metrics.json"
        if not row and mj.exists():
            row = {
                k: v
                for k, v in json.loads(mj.read_text())["results"].items()
                if k.endswith("_mean")
            }
        pts = trajectory(root / name)
        if pts:
            steps, vals = zip(*pts)
            i_min = vals.index(min(vals))
            row["eval_points"] = len(pts)
            row["eval_min_step"] = steps[i_min]
            row["eval_last_step"] = steps[-1]
            row["eval_min"] = vals[i_min]
            row["eval_last"] = vals[-1]
            # interior minimum = overfit wall: the best eval was not at (or
            # within 10% MSE of) the end of the run
            row["interior_minimum"] = bool(
                steps[i_min] < steps[-1] and vals[-1] > vals[i_min] * 1.10
            )
        out[name] = row
    return out


def main() -> None:
    roots = [Path(a) for a in sys.argv[1:]] or [Path("outputs/qa_r5/rich")]
    for root in roots:
        print(f"\n=== {root}")
        summary = summarize_root(root)
        for name, row in summary.items():
            keep = {
                k: row[k]
                for k in (
                    "psnr_thermal_mean", "mae_thermal_mean",
                    "mae_thermal_foreground_mean", "psnr_mean",
                    "trained_steps", "eval_points", "eval_min_step",
                    "eval_last_step", "eval_min", "eval_last",
                    "interior_minimum",
                )
                if k in row
            }
            print(name, json.dumps(keep))


if __name__ == "__main__":
    main()
