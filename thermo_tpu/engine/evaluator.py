"""Offline evaluation: per-image metrics + rendered eval images.

TPU-native equivalent of thermo_nerf/evaluator/evaluator.py (``Evaluator``):
iterate the fixed eval cameras, render full images in chunks, compute
PSNR/SSIM/LPIPS/MAE per image (RGB + thermal variants,
thermal_nerf_model.py:328-393 / thermal_nerfacto.py:47-84 /
concat_nerfacto_model.py:250-324), aggregate mean/std per metric
(evaluator.py:95-104), and write ``metrics.json`` + per-metric txt files +
eval images (evaluator.py:108-167 — schema preserved).

Quirk preserved: the camera optimizer IS applied to eval rays using the eval
camera indices into the train-sized pose table (evaluator.py:68-76).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional

import numpy as np

from thermo_tpu.engine.pipeline import Pipeline
from thermo_tpu.engine.trainer import make_render_fn
from thermo_tpu.metrics.image_metrics import mae_thermal, psnr, ssim
from thermo_tpu.metrics.lpips import lpips_fn
from thermo_tpu.modalities import RenderedImageModality
from thermo_tpu.utils.colormaps import (
    apply_depth_colormap,
    apply_float_colormap,
    to_uint8,
)


class Evaluator:
    def __init__(
        self,
        pipeline: Pipeline,
        threshold: Optional[float] = None,
        modalities_to_save: Optional[list[RenderedImageModality]] = None,
        identifier: Optional[str] = "eval",
        lpips_weights_path: Optional[str] = None,
    ):
        self.pipeline = pipeline
        self.threshold = threshold
        self.identifier = identifier
        mode = pipeline.config.model.mode
        if modalities_to_save is None:
            modalities_to_save = [
                RenderedImageModality.RGB,
                RenderedImageModality.DEPTH,
                RenderedImageModality.ACCUMULATION,
            ]
            if mode in ("thermal", "concat"):
                modalities_to_save += [
                    RenderedImageModality.THERMAL,
                    RenderedImageModality.THERMAL_COMBINED,
                ]
        self.modalities_to_save = modalities_to_save
        self._lpips = lpips_fn(lpips_weights_path)
        self._metrics: dict = {}
        self._evaluation_images: dict[RenderedImageModality, list[np.ndarray]] = {}

    # ------------------------------------------------------------------
    def _image_metrics_and_images(self, outputs, gt_rgb, gt_thermal):
        """get_image_metrics_and_images for the active mode."""
        cfg = self.pipeline.config.model
        mode = cfg.mode
        m: dict[str, float] = {}
        images: dict[RenderedImageModality, np.ndarray] = {}

        pred_rgb = outputs["rgb"]
        acc = outputs["accumulation"]
        depth = outputs["depth"]

        images[RenderedImageModality.ACCUMULATION] = apply_float_colormap(
            acc, "turbo"
        )
        images[RenderedImageModality.DEPTH] = apply_depth_colormap(
            depth, accumulation=acc
        )

        if mode == "concat":
            # metrics on the thermal channel only (concat_nerfacto_model.py:277-308)
            gt_t = gt_rgb[..., 3:4]
            pred_t = pred_rgb[..., 3:4]
            m["psnr"] = float(psnr(pred_t, gt_t))
            m["ssim"] = float(ssim(pred_t, gt_t))
            if self._lpips is not None:
                m["lpips"] = float(
                    self._lpips(np.repeat(gt_t, 3, -1), np.repeat(pred_t, 3, -1))
                )
            m["mae_thermal_foreground"] = float(
                mae_thermal(gt_t, pred_t, cfg.cold, cfg.max_temperature,
                            cfg.min_temperature, self.threshold)
            )
            m["mae_thermal"] = float(
                mae_thermal(gt_t, pred_t, cfg.cold, cfg.max_temperature,
                            cfg.min_temperature, None)
            )
            images[RenderedImageModality.RGB] = np.concatenate(
                [gt_rgb[..., :3], pred_rgb[..., :3]], axis=1
            )
            images[RenderedImageModality.THERMAL] = apply_float_colormap(pred_t, "gray")
            images[RenderedImageModality.THERMAL_COMBINED] = np.concatenate(
                [apply_float_colormap(gt_t, "gray"), apply_float_colormap(pred_t, "gray")],
                axis=1,
            )
            return m, images

        # rgb / thermal modes: RGB metrics first (NerfactoModel +
        # ThermalNerfactoModel.get_image_metrics_and_images)
        m["psnr"] = float(psnr(pred_rgb, gt_rgb))
        m["ssim"] = float(ssim(pred_rgb, gt_rgb))
        if self._lpips is not None:
            m["lpips"] = float(self._lpips(gt_rgb, pred_rgb))
        m["mae_foreground"] = float(
            mae_thermal(gt_rgb, pred_rgb, cfg.cold, cfg.max_temperature,
                        cfg.min_temperature, self.threshold)
        )
        m["mae"] = float(
            mae_thermal(gt_rgb, pred_rgb, cfg.cold, cfg.max_temperature,
                        cfg.min_temperature, None)
        )
        images[RenderedImageModality.RGB] = np.concatenate([gt_rgb, pred_rgb], axis=1)

        if mode == "thermal" and gt_thermal is not None:
            pred_t = outputs["thermal"]
            images[RenderedImageModality.THERMAL] = apply_float_colormap(pred_t, "gray")
            images[RenderedImageModality.THERMAL_COMBINED] = np.concatenate(
                [apply_float_colormap(gt_thermal, "gray"),
                 apply_float_colormap(pred_t, "gray")],
                axis=1,
            )
            m["psnr_thermal"] = float(psnr(pred_t, gt_thermal))
            m["ssim_thermal"] = float(ssim(pred_t, gt_thermal))
            if self._lpips is not None:
                m["lpips_thermal"] = float(
                    self._lpips(np.repeat(gt_thermal, 3, -1), np.repeat(pred_t, 3, -1))
                )
            m["mae_thermal_foreground"] = float(
                mae_thermal(gt_thermal, pred_t, cfg.cold, cfg.max_temperature,
                            cfg.min_temperature, self.threshold)
            )
            m["mae_thermal"] = float(
                mae_thermal(gt_thermal, pred_t, cfg.cold, cfg.max_temperature,
                            cfg.min_temperature, None)
            )
        return m, images

    @property
    def metrics(self) -> dict:
        """Aggregated metrics of the last ``compute_metrics`` run: per-metric
        ``<name>_mean`` / ``<name>_std`` floats plus the per-image lists
        (reference evaluator.py:95-104 schema)."""
        return self._metrics

    # ------------------------------------------------------------------
    def compute_metrics(self) -> dict:
        pipe = self.pipeline
        assert pipe.params is not None, "pipeline has no restored params"
        assert pipe.eval_stack is not None and pipe.eval_outputs is not None
        render = make_render_fn(
            pipe.model,
            chunk_size=pipe.config.eval_num_rays_per_chunk,
            apply_camera_opt=pipe.config.model.camera_optimizer_mode != "off",
        )
        cameras = pipe.eval_cameras
        stack = pipe.eval_stack
        for mod in self.modalities_to_save:
            self._evaluation_images[mod] = []

        per_image: list[dict[str, float]] = []
        for i in range(stack.num_images):
            outputs = render(
                pipe.params, cameras, i, stack.height, stack.width
            )
            gt_rgb = stack.images[i].astype(np.float32) / 255.0
            gt_thermal = (
                stack.thermal[i].astype(np.float32) / 255.0
                if stack.thermal is not None
                else None
            )
            if pipe.config.model.mode == "concat" and gt_thermal is not None:
                gt_rgb = np.concatenate([gt_rgb, gt_thermal], axis=-1)
            m, images = self._image_metrics_and_images(outputs, gt_rgb, gt_thermal)
            per_image.append(m)
            for mod in self.modalities_to_save:
                if mod in images:
                    self._evaluation_images[mod].append(to_uint8(images[mod]))

        agg: dict = {}
        for key in per_image[0]:
            vals = np.asarray([m[key] for m in per_image], np.float64)
            agg[f"{key}_mean"] = float(vals.mean())
            agg[f"{key}_std"] = float(vals.std(ddof=1)) if len(vals) > 1 else 0.0
            agg[key] = [float(v) for v in vals]
        self._metrics = agg
        return agg

    # ------------------------------------------------------------------
    def save_images(self, output_path: Path) -> None:
        output_path = Path(output_path)
        output_path.mkdir(parents=True, exist_ok=True)
        from PIL import Image

        for mod in self.modalities_to_save:
            for idx, image in enumerate(self._evaluation_images.get(mod, [])):
                Image.fromarray(image).save(output_path / f"{mod.value}_{idx:05d}.jpg")

    def save_metrics(self, output_folder: Path) -> None:
        """metrics.json + per-metric txt folders (evaluator.py:126-167)."""
        output_folder = Path(output_folder)
        output_folder.mkdir(parents=True, exist_ok=True)
        info = {
            "experiment_name": self.pipeline.config.experiment_name,
            "method_name": self.pipeline.config.method_name,
            "job_param_identifier": self.identifier,
            "results": self._metrics,
        }
        (output_folder / "metrics.json").write_text(json.dumps(info, indent=2))

        if self.identifier is None:
            return
        for metric in ("psnr", "ssim", "lpips"):
            folder = output_folder / metric
            folder.mkdir(parents=True, exist_ok=True)
            if metric in self._metrics:
                (folder / f"{self.identifier}.txt").write_text(
                    json.dumps(self._metrics[metric], indent=2)
                )
            if f"{metric}_thermal" in self._metrics:
                (folder / f"{self.identifier}_thermal.txt").write_text(
                    json.dumps(self._metrics[f"{metric}_thermal"], indent=2)
                )
