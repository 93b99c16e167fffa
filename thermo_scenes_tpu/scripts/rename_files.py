"""Pair, resize, and rename raw rgb/thermal captures into the ThermoScenes
``frame_{train,eval}_%05d.png`` layout.

Equivalent of thermo_scenes/scripts/rename_files.py:10-126: pairs sorted
``rgb_{train,eval}`` / ``thermal_{train,eval}`` dirs, resizes RGB to the
thermal resolution (LANCZOS), writes ``*_processed`` dirs.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from PIL import Image as PILImage

IMAGE_SUFFIXES = {".png", ".jpg", ".jpeg", ".PNG", ".JPG", ".JPEG"}


def list_images(directory: Path) -> list[Path]:
    return sorted(p for p in Path(directory).iterdir() if p.suffix in IMAGE_SUFFIXES)


def load_images(base_path: Path):
    dirs = {
        name: Path(base_path, name)
        for name in ("rgb_train", "thermal_train", "rgb_eval", "thermal_eval")
    }
    for d in dirs.values():
        if not d.exists():
            raise Exception(f"Error: Directory {d} not found in {base_path}")
    rgb_train = list_images(dirs["rgb_train"])
    th_train = list_images(dirs["thermal_train"])
    rgb_eval = list_images(dirs["rgb_eval"])
    th_eval = list_images(dirs["thermal_eval"])
    if len(rgb_train) != len(th_train):
        raise Exception("Error: The number of RGB and thermal train images do not match.")
    if len(rgb_eval) != len(th_eval):
        raise Exception("Error: The number of RGB and thermal eval images do not match.")
    return list(zip(rgb_train, th_train)), list(zip(rgb_eval, th_eval))


def resize_image(image_path: Path, target_size: tuple):
    with PILImage.open(image_path) as img:
        return img.resize(target_size, PILImage.Resampling.LANCZOS)


def save_images(images, base_path: Path, dir_name_rgb: str, dir_name_thermal: str, prefix: str) -> None:
    if not images:
        return
    Path(base_path, dir_name_rgb).mkdir(exist_ok=True)
    Path(base_path, dir_name_thermal).mkdir(exist_ok=True)
    for index, (rgb_path, thermal_path) in enumerate(images, start=1):
        name = f"{prefix}_{index:05d}.png"
        with PILImage.open(thermal_path) as thermal_img:
            target_size = (thermal_img.width, thermal_img.height)
        resize_image(rgb_path, target_size).save(Path(base_path, dir_name_rgb, name))
        resize_image(thermal_path, target_size).save(
            Path(base_path, dir_name_thermal, name)
        )


def process(path_to_folder: Path) -> None:
    train_images, eval_images = load_images(path_to_folder)
    save_images(train_images, path_to_folder, "rgb_train_processed",
                "thermal_train_processed", "frame_train")
    save_images(eval_images, path_to_folder, "rgb_eval_processed",
                "thermal_eval_processed", "frame_eval")


def cli() -> None:
    p = argparse.ArgumentParser(description=process.__doc__)
    p.add_argument("path_to_folder", type=Path)
    process(p.parse_args().path_to_folder)


if __name__ == "__main__":
    cli()
