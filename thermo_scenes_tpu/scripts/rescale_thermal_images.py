"""Re-map eval thermal images from their own temperature bounds to the train
bounds (clipped to [0, 1]).

Equivalent of thermo_scenes/scripts/rescale_thermal_images.py:26-151.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image as PILImage

IMAGE_SUFFIXES = {".PNG", ".JPG", ".jpeg", ".png", ".jpg"}


def scale(img_array, min_origin, max_origin, min_target, max_target):
    return (img_array - min_origin) / (max_origin - min_origin) * (
        max_target - min_target
    ) + min_target


def scale_image(img_array, t_min, t_max):
    return scale(img_array, 0, 1, t_min, t_max)


def unscale_image(img_array, t_min, t_max):
    return scale(img_array, t_min, t_max, 0, 1)


def scale_test_to_train(img, t_min, t_max, t_min_new, t_max_new):
    img_array = np.array(img) / 255.0
    scaled = scale_image(img_array, t_min, t_max)
    unscaled = np.clip(unscale_image(scaled, t_min_new, t_max_new), 0, 1)
    return PILImage.fromarray((unscaled * 255).astype(np.uint8))


def process_images(input_folder: Path, output_folder: Path,
                   t_min: float, t_max: float,
                   t_min_new: float, t_max_new: float) -> None:
    output_folder.mkdir(exist_ok=True, parents=True)
    for filename in Path(input_folder).iterdir():
        if filename.suffix not in IMAGE_SUFFIXES:
            continue
        img = PILImage.open(filename).convert("RGB")
        scale_test_to_train(img, t_min, t_max, t_min_new, t_max_new).save(
            Path(output_folder, filename.name)
        )


def cli() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input-folder", type=Path, required=True)
    p.add_argument("--output-folder", type=Path, required=True)
    p.add_argument("--t-min", type=float, required=True)
    p.add_argument("--t-max", type=float, required=True)
    p.add_argument("--t-min-new", type=float, required=True)
    p.add_argument("--t-max-new", type=float, required=True)
    a = p.parse_args()
    process_images(a.input_folder, a.output_folder, a.t_min, a.t_max, a.t_min_new, a.t_max_new)


if __name__ == "__main__":
    cli()
