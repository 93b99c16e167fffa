"""Camera-path rendering CLI.

Equivalent of thermo_nerf/scripts/render_video_script.py:15-95: camera-path
JSON + checkpoint -> per-modality JPEG frames and/or an animated GIF
(duration = the camera path's ``seconds``), optional downscale; default
modalities RGB + THERMAL (:30-36).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

from thermo_tpu.engine.renderer import Renderer
from thermo_tpu.modalities import RenderedImageModality
from thermo_tpu.utils.cli import parse_cli


@dataclasses.dataclass
class RenderParameters:
    """Render a camera trajectory from a trained checkpoint."""

    model_path: Path = Path("./outputs")
    camera_path: Path = Path("./camera_path.json")
    output_dir: Path = Path("./renders")
    data: Optional[Path] = None
    downscale_factor: float = 1.0
    save_frames: bool = True
    save_gif: bool = True
    modalities: tuple = (
        RenderedImageModality.RGB.value,
        RenderedImageModality.THERMAL.value,
    )


def main(p: RenderParameters) -> None:
    modalities = [RenderedImageModality(m) for m in p.modalities]
    renderer = Renderer.from_pipeline_path(p.model_path, data=p.data)
    if renderer.pipeline.config.model.mode == "rgb":
        modalities = [RenderedImageModality.RGB]
    cameras, meta = Renderer.load_cameras(p.camera_path, p.downscale_factor)
    renderer.render(modalities, cameras)
    out = Path(p.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    if p.save_frames:
        renderer.save_images(modalities, out)
    if p.save_gif:
        renderer.save_gif(modalities, meta["seconds"], out)


def cli() -> None:
    from thermo_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    main(parse_cli(RenderParameters))


if __name__ == "__main__":
    cli()
