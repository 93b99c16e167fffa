"""FLIR sensor noise study: pixel-wise temperature mean/std over a burst of
images of a static scene.

Equivalent of thermo_scenes/scripts/evaluate_camera_precision.py:11-125
(PIL instead of cv2; same .txz auto-extraction and final
"Mean of pixel-wise std" report — the dataset noise floor, SURVEY §6).
"""

from __future__ import annotations

import argparse
import json
import tarfile
from pathlib import Path

import numpy as np
from PIL import Image


def read_image(image_path: Path, min_value: float, max_value: float) -> np.ndarray:
    image = np.asarray(Image.open(image_path).convert("RGB"), np.float32)
    return min_value + (image / 255.0) * (max_value - min_value)


def pixel_wise_mean(image_folder: Path, min_value: float, max_value: float) -> np.ndarray:
    total, count = None, 0
    for image_path in sorted(image_folder.iterdir()):
        image = read_image(image_path, min_value, max_value)
        total = image if total is None else total + image
        count += 1
    assert total is not None
    return total / count


def pixel_wise_std(
    image_folder: Path, pixel_mean: np.ndarray, min_value: float, max_value: float
) -> np.ndarray:
    total, count = None, 0
    for image_path in sorted(image_folder.iterdir()):
        sq = (read_image(image_path, min_value, max_value) - pixel_mean) ** 2
        total = sq if total is None else total + sq
        count += 1
    assert total is not None
    return np.sqrt(total / count)


def cli() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--img-path", type=Path, default=Path("data/camera_precision_experiment.tar.xz")
    )
    a = p.parse_args()
    img_path = a.img_path
    if not img_path.exists():
        raise FileNotFoundError(f"Could not find file: {img_path}")
    if img_path.is_file() and img_path.suffix == ".txz":
        data_folder = img_path.parent / img_path.stem
        with tarfile.open(img_path, "r:xz") as tar_ref:
            tar_ref.extractall(img_path.parent)
        img_path = data_folder
    img_path = img_path / "thermal"
    bounds = json.loads((img_path.parent / "temperature_bounds.json").read_text())
    mn = bounds["absolute_min_temperature"]
    mx = bounds["absolute_max_temperature"]
    mean = pixel_wise_mean(img_path, mn, mx)
    std = pixel_wise_std(img_path, mean, mn, mx)
    print(f"Mean of pixel-wise std: {np.mean(std)}")


if __name__ == "__main__":
    cli()
