"""Experiment metric tracking.

Equivalent of the reference's mlflow logging
(nerfstudio_config/pipeline_tracking.py:16-17,47-59: train metrics + losses
logged every ~1/0.0075 = 133 steps). mlflow is not part of this environment,
so the default sink is a JSONL file under the experiment dir (one record per
logging step: {"step", "metrics"}), with an mlflow sink auto-enabled when
the package is importable.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

try:  # pragma: no cover - mlflow not installed in this environment
    import mlflow  # type: ignore

    _HAVE_MLFLOW = True
except Exception:  # pragma: no cover
    mlflow = None
    _HAVE_MLFLOW = False


class MetricsTracker:
    def __init__(
        self,
        experiment_dir: Path,
        experiment_name: str = "thermo-tpu",
        use_mlflow: Optional[bool] = None,
    ):
        self.path = Path(experiment_dir) / "train_metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a")
        self.use_mlflow = _HAVE_MLFLOW if use_mlflow is None else use_mlflow
        if self.use_mlflow and _HAVE_MLFLOW:  # pragma: no cover
            mlflow.set_experiment(experiment_name)
            self._run = mlflow.start_run()

    def log_metrics(self, metrics: dict[str, float], step: int) -> None:
        record = {"step": step, "metrics": {k: float(v) for k, v in metrics.items()}}
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()
        if self.use_mlflow and _HAVE_MLFLOW:  # pragma: no cover
            mlflow.log_metrics(record["metrics"], step=step)

    def close(self) -> None:
        self._fh.close()
        if self.use_mlflow and _HAVE_MLFLOW:  # pragma: no cover
            mlflow.end_run()
