"""Pipeline assembly: config + data + model + params.

The functional replacement for nerfstudio's VanillaPipeline construction
(SURVEY §3.1) and the reference Renderer's checkpoint->pipeline
reconstruction (renderer.py:69-115): build everything from a TrainerConfig,
or rebuild from an experiment directory (config.json + latest orbax
checkpoint + dataparser_transforms.json).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np

from thermo_tpu.configs.base import TrainerConfig
from thermo_tpu.data.cameras import Cameras
from thermo_tpu.data.dataparser import DataparserOutputs, parse_transforms
from thermo_tpu.data.dataset import ImageStack, load_image_stack
from thermo_tpu.engine import checkpoints as ckpt
from thermo_tpu.models.thermal_nerf import ThermoNerfModel


def _to_jax_cameras(outputs: DataparserOutputs) -> Cameras:
    c = outputs.cameras
    return Cameras.from_numpy(
        fx=c.fx, fy=c.fy, cx=c.cx, cy=c.cy,
        width=c.width, height=c.height, c2w=c.c2w, distortion=c.distortion,
    )


@dataclasses.dataclass
class Pipeline:
    config: TrainerConfig
    model: ThermoNerfModel
    train_outputs: Optional[DataparserOutputs] = None
    eval_outputs: Optional[DataparserOutputs] = None
    train_stack: Optional[ImageStack] = None
    eval_stack: Optional[ImageStack] = None
    params: Any = None
    step: int = 0

    @property
    def train_cameras(self) -> Cameras:
        assert self.train_outputs is not None
        return _to_jax_cameras(self.train_outputs)

    @property
    def eval_cameras(self) -> Cameras:
        assert self.eval_outputs is not None
        return _to_jax_cameras(self.eval_outputs)


def build_pipeline(
    config: TrainerConfig,
    load_train: bool = True,
    load_eval: bool = True,
) -> Pipeline:
    """Parse data, decode image stacks, construct the model."""
    train_outputs = parse_transforms(config.dataparser, "train") if load_train else None
    eval_outputs = parse_transforms(config.dataparser, "val") if load_eval else None

    any_outputs = train_outputs or eval_outputs
    assert any_outputs is not None
    num_train = (
        len(train_outputs.image_filenames)
        if train_outputs is not None
        else len(any_outputs.image_filenames)
    )
    model = ThermoNerfModel(
        config.model, any_outputs.scene_box_aabb, num_train_images=num_train
    )

    concat = config.model.mode == "concat"
    train_stack = (
        load_image_stack(train_outputs, concat_thermal_from_sibling=concat)
        if train_outputs is not None
        else None
    )
    eval_stack = (
        load_image_stack(eval_outputs, concat_thermal_from_sibling=concat)
        if eval_outputs is not None
        else None
    )
    return Pipeline(
        config=config,
        model=model,
        train_outputs=train_outputs,
        eval_outputs=eval_outputs,
        train_stack=train_stack,
        eval_stack=eval_stack,
    )


def load_pipeline_from_dir(
    model_dir: Path,
    data: Optional[Path] = None,
    load_eval: bool = True,
) -> Pipeline:
    """Reference Renderer.extract_pipeline equivalent: discover the unique
    config snapshot under ``model_dir``, rebuild the model, and restore the
    latest checkpoint (renderer.py:34-115)."""
    exp_dir = ckpt.find_experiment_dir(Path(model_dir))
    config = TrainerConfig.load(exp_dir / ckpt.CONFIG_NAME)
    if data is not None:
        config.dataparser.data = Path(data)

    pipe = build_pipeline(config, load_train=True, load_eval=load_eval)

    path = ckpt.latest_checkpoint(exp_dir)
    if path is None:
        raise FileNotFoundError(f"no checkpoint under {exp_dir}")
    restored, step = ckpt.load_checkpoint(path)
    pipe.params = jax.tree_util.tree_map(
        lambda x: jax.numpy.asarray(x), restored["params"]
    )
    pipe.step = step
    return pipe
