"""Colorize grayscale thermal images with the magma colormap and the
dataset temperature bounds (optional colorbar).

Equivalent of thermo_scenes/scripts/colorize_thermal_images.py:10-98.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from PIL import Image

IMAGE_SUFFIXES = {".jpg", ".png", ".PNG", ".jpeg"}


def save_image_with_colormap(image: np.ndarray, output_img: Path,
                             min_temp: float, max_temp: float,
                             display_cmap: bool = False, show: bool = False) -> None:
    cmap = plt.cm.magma
    norm = (image - min_temp) / (max_temp - min_temp)
    colored = cmap(norm)
    plt.figure()
    plt.imshow(colored, cmap=cmap, vmin=min_temp, vmax=max_temp)
    plt.axis("off")
    if display_cmap:
        cbar = plt.colorbar(orientation="vertical", fraction=0.05, cmap=cmap)
        cbar.set_label("Temperature", rotation=270, labelpad=15)
        cbar.ax.yaxis.label.set_fontsize(18)
        cbar.ax.tick_params(labelsize=18)
    plt.savefig(output_img, transparent=True, bbox_inches="tight", pad_inches=0)
    if show:
        plt.show()
    plt.close()


def main(images: Path, output_dir: Path, temperatures_bound: Path,
         display_cmap: bool = False) -> None:
    if temperatures_bound.suffix != ".json":
        raise ValueError("The temperature_bound file must be a json file.")
    if images == output_dir:
        raise ValueError("The images_path and output_dir cannot be the same.")
    output_dir.mkdir(parents=True, exist_ok=True)
    bounds = json.loads(Path(temperatures_bound).read_text())
    max_temp = bounds["absolute_max_temperature"]
    min_temp = bounds["absolute_min_temperature"]
    for image_path in Path(images).iterdir():
        if image_path.suffix not in IMAGE_SUFFIXES:
            continue
        gray = np.array(Image.open(image_path).convert("L")) / 255.0
        # grayscale [0,1] -> degC -> colormap against the bounds
        temps = gray * (max_temp - min_temp) + min_temp
        save_image_with_colormap(
            temps, Path(output_dir, image_path.name), min_temp, max_temp,
            display_cmap=display_cmap,
        )


def cli() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--images", type=Path, required=True)
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--temperatures-bound", type=Path, required=True)
    p.add_argument("--display-cmap", action="store_true")
    a = p.parse_args()
    main(a.images, a.output_dir, a.temperatures_bound, a.display_cmap)


if __name__ == "__main__":
    cli()
