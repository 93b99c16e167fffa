"""Checkpoint I/O.

TPU-native equivalent of the reference's torch.save/load checkpoints
(``{"pipeline": state_dict, "step": int}`` + yaml config +
``dataparser_transforms.json`` sidecar; renderer.py:94-113, SURVEY §5):
orbax for the param/optimizer pytree, JSON for the config snapshot and the
dataparser transform, same experiment-directory discovery contract
(``config.json`` unique under the experiment dir, checkpoints in
``<exp>/checkpoints/step_<N>``).
"""

from __future__ import annotations

import json
import re
import shutil
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from thermo_tpu.configs.base import TrainerConfig

CONFIG_NAME = "config.json"
TRANSFORMS_NAME = "dataparser_transforms.json"
CKPT_DIR = "checkpoints"
_STEP_RE = re.compile(r"step_(\d+)$")


def checkpoint_dir(experiment_dir: Path) -> Path:
    return Path(experiment_dir) / CKPT_DIR


def save_checkpoint(
    experiment_dir: Path,
    step: int,
    state: Any,
    config: Optional[TrainerConfig] = None,
    dataparser_transform: Optional[np.ndarray] = None,
    dataparser_scale: Optional[float] = None,
    keep_only_latest: bool = True,
) -> Path:
    """Save params/opt_state pytree at ``<exp>/checkpoints/step_<N>``."""
    exp = Path(experiment_dir)
    ckpts = checkpoint_dir(exp)
    ckpts.mkdir(parents=True, exist_ok=True)
    path = ckpts / f"step_{step:09d}"

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            path.absolute(),
            {"state": jax.device_get(state), "step": step},
            force=True,
        )

    if config is not None:
        (exp / CONFIG_NAME).write_text(config.to_json())
    if dataparser_transform is not None:
        (exp / TRANSFORMS_NAME).write_text(
            json.dumps(
                {
                    "transform": np.asarray(dataparser_transform).tolist(),
                    "scale": float(dataparser_scale if dataparser_scale is not None else 1.0),
                },
                indent=2,
            )
        )
    if keep_only_latest:
        for other in ckpts.iterdir():
            if other != path and _STEP_RE.search(other.name):
                shutil.rmtree(other, ignore_errors=True)
    return path


def latest_checkpoint(experiment_dir: Path) -> Optional[Path]:
    ckpts = checkpoint_dir(experiment_dir)
    if not ckpts.exists():
        return None
    steps = [
        (int(m.group(1)), p)
        for p in ckpts.iterdir()
        if (m := _STEP_RE.search(p.name))
    ]
    if not steps:
        return None
    return max(steps)[1]


def load_checkpoint(path: Path, target: Any = None) -> tuple[Any, int]:
    """Load (state_pytree, step) as host numpy arrays. ``target`` is accepted
    for API compatibility but restoration is structure-from-disk (orbax
    stores the full pytree structure)."""
    del target
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(Path(path).absolute())
    return restored["state"], int(restored["step"])


def find_experiment_dir(root: Path) -> Path:
    """Locate the unique experiment dir under ``root`` containing a config
    snapshot (Renderer._get_trainer rglob contract, renderer.py:49-55)."""
    root = Path(root)
    if (root / CONFIG_NAME).exists():
        return root
    candidates = sorted(p.parent for p in root.rglob(CONFIG_NAME))
    if len(candidates) != 1:
        raise RuntimeError(
            f"expected exactly one {CONFIG_NAME} under {root}, found {len(candidates)}"
        )
    return candidates[0]


def load_dataparser_transforms(experiment_dir: Path) -> tuple[np.ndarray, float]:
    d = json.loads((Path(experiment_dir) / TRANSFORMS_NAME).read_text())
    return np.asarray(d["transform"], np.float32), float(d["scale"])
