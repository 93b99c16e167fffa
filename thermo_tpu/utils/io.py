"""Image / GIF writing via PIL (imageio is not in this environment)."""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np
from PIL import Image


def write_image(path: Path, image_u8: np.ndarray) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if image_u8.ndim == 3 and image_u8.shape[-1] == 1:
        image_u8 = image_u8[..., 0]
    Image.fromarray(image_u8).save(path)


def write_gif(path: Path, frames_u8: Sequence[np.ndarray], seconds: float) -> None:
    """Save an animated GIF with total duration ``seconds`` (matching the
    reference's imageio.mimsave(duration=seconds) call, renderer.py:215-228)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    imgs = [Image.fromarray(f) for f in frames_u8]
    ms_per_frame = max(20, int(1000.0 * seconds / max(len(imgs), 1)))
    imgs[0].save(
        path,
        save_all=True,
        append_images=imgs[1:],
        duration=ms_per_frame,
        loop=0,
    )
