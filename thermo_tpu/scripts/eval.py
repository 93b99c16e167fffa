"""Offline evaluation CLI.

Equivalent of thermo_nerf/scripts/eval_script.py:11-47: load a trained
experiment directory + dataset, run the Evaluator, write metrics.json and
eval images.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

from thermo_tpu.engine.evaluator import Evaluator
from thermo_tpu.engine.pipeline import load_pipeline_from_dir
from thermo_tpu.metrics.otsu import calculate_threshold
from thermo_tpu.utils.cli import parse_cli


@dataclasses.dataclass
class EvalParameters:
    """Evaluate a trained thermal NeRF checkpoint."""

    model_uri: Path = Path("./outputs")
    dataset_path: Path = Path("./inputs")
    output_folder: Path = Path("./eval")
    identifier: str = "eval"
    compute_threshold: bool = True


def main(p: EvalParameters) -> None:
    pipe = load_pipeline_from_dir(p.model_uri, data=p.dataset_path)
    threshold = None
    if p.compute_threshold:
        path_key = (
            "file_path" if pipe.config.model.mode == "rgb" else "thermal_file_path"
        )
        threshold = calculate_threshold(p.dataset_path, path_key=path_key)
    evaluator = Evaluator(pipe, threshold=threshold, identifier=p.identifier)
    evaluator.compute_metrics()
    evaluator.save_metrics(p.output_folder)
    evaluator.save_images(Path(p.output_folder))


def cli() -> None:
    from thermo_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    main(parse_cli(EvalParameters))


if __name__ == "__main__":
    cli()
