"""Otsu foreground threshold.

TPU-native (pure numpy) equivalent of
thermo_nerf/thermal_nerf/calculate_threshold.py:9-39, which uses
cv2.THRESH_OTSU per image and averages: per-dataset threshold = mean of
per-image Otsu thresholds over the ``thermal_file_path`` images (or
``file_path`` for the nerfacto baseline), divided by 255.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from PIL import Image


def otsu_threshold(gray_u8: np.ndarray) -> int:
    """Otsu's threshold on a uint8 image, cv2-compatible.

    cv2 returns the threshold t maximizing inter-class variance, where the
    binarization is ``pixel > t``; we replicate its argmax convention
    (maximize sigma_b^2 over t in [0, 255], taking the first maximum).
    """
    hist = np.bincount(gray_u8.reshape(-1), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 0
    p = hist / total
    omega = np.cumsum(p)  # class 0 probability for threshold t (<= t)
    mu = np.cumsum(p * np.arange(256))
    mu_t = mu[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = (mu_t * omega - mu) ** 2 / (omega * (1.0 - omega))
    sigma_b = np.nan_to_num(sigma_b, nan=0.0, posinf=0.0)
    return int(np.argmax(sigma_b))


def calculate_threshold(data: Path, path_key: str = "thermal_file_path") -> float:
    """Dataset-mean Otsu threshold in [0, 1] (calculate_threshold.py:9-39).

    ``path_key``: "thermal_file_path", or "file_path" for the nerfacto
    (thermal-as-RGB) baseline (calculate_threshold.py:25-27).
    """
    data = Path(data)
    if data.suffix == ".json":
        meta = json.loads(data.read_text())
        data_dir = data.parent
    else:
        meta = json.loads((data / "transforms.json").read_text())
        data_dir = data

    thresholds = []
    for frame in meta["frames"]:
        img_path = data_dir / Path(frame[path_key])
        with Image.open(img_path) as im:
            gray = np.asarray(im.convert("L"), dtype=np.uint8)
        thresholds.append(otsu_threshold(gray))
    return float(sum(thresholds) / len(thresholds)) / 255.0
