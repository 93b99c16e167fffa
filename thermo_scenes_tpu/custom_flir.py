"""FLIR MSX dataset preprocessing.

Equivalent of thermo_scenes/flir_thermal_images/custom_flir.py (``CustomFlir``
+ ``get_min_max_temperatures`` + ``normalise``), built on the pure-Python
``thermo_scenes_tpu.flir`` extractor instead of the exiftool-based
FlirImageExtractor submodule.

Per MSX JPEG it produces (same directory layout and naming as the
reference, custom_flir.py:51-126):
  * ``msx/``      — copy of the inputs
  * ``rgb/``      — extracted visible photos as PNG
  * ``csv/``      — per-pixel temperature CSVs (columns x, y, "temp (c)")
  * ``thermal/``  — grayscale thermal PNGs normalized to the DATASET-wide
                    min/max temperature
  * ``temperature_bounds.json`` — the absolute min/max bounds that define
                    the [0,1] <-> degC mapping used by training/eval.
"""

from __future__ import annotations

import csv
import json
import shutil
from pathlib import Path

import numpy as np
from PIL import Image

from thermo_scenes_tpu.flir import extract_flir


def get_min_max_temperatures(path_to_csv_files: Path) -> tuple[float, float]:
    """Min/max temperature across all per-pixel CSVs (custom_flir.py:12-26)."""
    mn, mx = np.inf, -np.inf
    for path in Path(path_to_csv_files).iterdir():
        temps = read_temperature_csv(path)
        t = temps[np.isfinite(temps)]
        if t.size:
            mn = min(mn, float(t.min()))
            mx = max(mx, float(t.max()))
    return mn, mx


def normalise(input_temperatures: np.ndarray, minimum: float, maximum: float) -> np.ndarray:
    """(t - min) / (max - min) (custom_flir.py:29-38)."""
    return (input_temperatures - minimum) / (maximum - minimum)


def write_temperature_csv(path: Path, thermal_c: np.ndarray) -> None:
    """flirimageextractor-compatible CSV: header x,y,"temp (c)", row-major."""
    with open(path, "w", newline="") as fh:
        writer = csv.writer(fh, delimiter=",")
        writer.writerow(["x", "y", "temp (c)"])
        h, w = thermal_c.shape
        xs, ys = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        rows = np.stack(
            [xs.reshape(-1), ys.reshape(-1), thermal_c.reshape(-1)], axis=1
        )
        writer.writerows(rows.tolist())


def read_temperature_csv(path: Path) -> np.ndarray:
    vals = np.genfromtxt(path, delimiter=",", skip_header=1, usecols=2)
    return vals


class CustomFlir:
    """Process a directory of FLIR MSX JPEGs into a ThermoScenes raw layout."""

    def __init__(self, path_to_msx_images: Path, path_to_output_folder: Path) -> None:
        path_to_msx_images = Path(path_to_msx_images)
        out = Path(path_to_output_folder)
        out.mkdir(exist_ok=True, parents=True)
        if path_to_msx_images.parent != out:
            shutil.copytree(path_to_msx_images, out / "msx", dirs_exist_ok=True)

        rgb_dir = out / "rgb"
        thermal_dir = out / "thermal"
        csv_dir = out / "csv"
        for d in (rgb_dir, thermal_dir, csv_dir):
            d.mkdir(parents=True, exist_ok=True)

        self._thermal_shapes: dict[str, tuple[int, int]] = {}
        for img_path in sorted(path_to_msx_images.iterdir()):
            if img_path.is_dir():
                continue
            flir = extract_flir(img_path)
            write_temperature_csv(csv_dir / (img_path.stem + ".csv"), flir.thermal_c)
            if flir.visible is not None:
                Image.fromarray(flir.visible).save(rgb_dir / (img_path.stem + ".png"))
            self._thermal_shapes[img_path.stem] = flir.thermal_c.shape

        self.absolute_min_temperature, self.absolute_max_temperature = (
            get_min_max_temperatures(csv_dir)
        )
        self.save_normalised_thermal_images(thermal_dir, csv_dir)
        self.save_temperature_bounds(out / "temperature_bounds.json")

    def save_normalised_thermal_images(self, thermal_dir: Path, csv_dir: Path) -> None:
        for path in Path(csv_dir).iterdir():
            temps = read_temperature_csv(path)
            norm = 255 * normalise(
                temps, self.absolute_min_temperature, self.absolute_max_temperature
            )
            shape = self._thermal_shapes[path.stem]
            gray = norm.reshape(*shape).astype("uint8")
            Image.fromarray(gray, mode="L").save(Path(thermal_dir) / (path.stem + ".png"))

    def save_temperature_bounds(self, path_to_json: Path) -> None:
        Path(path_to_json).write_text(
            json.dumps(
                {
                    "absolute_max_temperature": self.absolute_max_temperature,
                    "absolute_min_temperature": self.absolute_min_temperature,
                }
            )
        )
