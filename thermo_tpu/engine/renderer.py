"""Camera-path rendering: checkpoint -> images / GIF.

TPU-native equivalent of thermo_nerf/render/renderer.py (``Renderer``):
reconstruct a pipeline from an experiment dir (renderer.py:69-115 — here via
``engine.pipeline.load_pipeline_from_dir``), load a camera-path JSON
(:143-158), render each camera no-grad (:160-201; thermal gets the magma
colormap :164,195-198, single-channel outputs are repeated to 3 channels),
save JPEG frames (:203-213) and/or an animated GIF with total duration
``seconds`` (:215-228).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from thermo_tpu.data.cameras import Cameras
from thermo_tpu.data.camera_paths import load_camera_path
from thermo_tpu.engine.pipeline import Pipeline, load_pipeline_from_dir
from thermo_tpu.engine.trainer import make_render_fn
from thermo_tpu.modalities import RenderedImageModality
from thermo_tpu.utils.colormaps import apply_float_colormap, to_uint8
from thermo_tpu.utils.io import write_gif, write_image


class Renderer:
    def __init__(self, pipeline: Pipeline):
        self.pipeline = pipeline
        self._rendered_images: dict[RenderedImageModality, list[np.ndarray]] = {}

    @classmethod
    def from_pipeline_path(
        cls, model_dir: Path, data: Optional[Path] = None
    ) -> "Renderer":
        return cls(load_pipeline_from_dir(model_dir, data=data, load_eval=False))

    @staticmethod
    def load_cameras(
        camera_path_file: Path, downscale_factor: float = 1.0
    ) -> tuple[Cameras, dict]:
        cameras, meta = load_camera_path(camera_path_file)
        if downscale_factor != 1.0:
            cameras = cameras.scaled(1.0 / downscale_factor)
        return cameras, meta

    def render(
        self,
        modalities: list[RenderedImageModality],
        cameras: Cameras,
        thermal_colormap: str = "magma",
    ) -> None:
        pipe = self.pipeline
        assert pipe.params is not None
        render = make_render_fn(
            pipe.model, chunk_size=pipe.config.eval_num_rays_per_chunk
        )
        heights = np.asarray(cameras.height)
        widths = np.asarray(cameras.width)
        self._rendered_images = {m: [] for m in modalities}
        for ci in range(len(cameras)):
            outputs = render(
                pipe.params, cameras, ci, int(heights[ci]), int(widths[ci])
            )
            for modality in modalities:
                key = (
                    "rgb" if modality == RenderedImageModality.RGB else modality.value
                )
                if key not in outputs:
                    raise KeyError(f"{modality.value} modality does not exist")
                img = outputs[key]
                if modality == RenderedImageModality.THERMAL:
                    img = apply_float_colormap(img, thermal_colormap)
                elif img.shape[-1] == 1:
                    img = np.repeat(img, 3, axis=-1)
                elif img.shape[-1] == 4:  # concat RGBT -> show RGB
                    img = img[..., :3]
                self._rendered_images[modality].append(to_uint8(img))

    def save_images(
        self, modalities: list[RenderedImageModality], output_dir: Path
    ) -> None:
        for modality in modalities:
            for idx, image in enumerate(self._rendered_images[modality]):
                write_image(
                    Path(output_dir) / f"{modality.value}_{idx:05d}.jpeg", image
                )

    def save_gif(
        self, modalities: list[RenderedImageModality], seconds: float, output_dir: Path
    ) -> None:
        for modality in modalities:
            write_gif(
                Path(output_dir) / f"synthesized_video_{modality.value}.gif",
                self._rendered_images[modality],
                seconds,
            )
