"""Normalize raw rgb/thermal captures into the ThermoScenes frame layout.

Capability parity with thermo_scenes/scripts/rename_files.py: given a capture
folder holding ``rgb_train``, ``thermal_train``, ``rgb_eval``, ``thermal_eval``
directories, pair the i-th RGB image with the i-th thermal image (sorted
order), resize the RGB image down to the thermal resolution (LANCZOS), and
write both into ``<modality>_<split>_processed/frame_<split>_%05d.png``.

Structured here as one split-level routine driven by a table of splits, with
paired iteration done lazily per frame.
"""

from __future__ import annotations

import argparse
from pathlib import Path

from PIL import Image

_SUFFIXES = {".png", ".jpg", ".jpeg"}
SPLITS = ("train", "eval")


def _frames(directory: Path) -> list[Path]:
    if not directory.is_dir():
        raise FileNotFoundError(f"expected capture directory {directory} to exist")
    return sorted(p for p in directory.iterdir() if p.suffix.lower() in _SUFFIXES)


def process_split(root: Path, split: str) -> int:
    """Pair/resize/rename one split. Returns the number of frames written."""
    rgb_frames = _frames(root / f"rgb_{split}")
    thermal_frames = _frames(root / f"thermal_{split}")
    if len(rgb_frames) != len(thermal_frames):
        raise ValueError(
            f"cannot pair {split} split: {len(rgb_frames)} rgb vs "
            f"{len(thermal_frames)} thermal images"
        )

    out_rgb = root / f"rgb_{split}_processed"
    out_thermal = root / f"thermal_{split}_processed"
    for d in (out_rgb, out_thermal):
        d.mkdir(exist_ok=True)

    for i, (rgb_path, thermal_path) in enumerate(zip(rgb_frames, thermal_frames), 1):
        name = f"frame_{split}_{i:05d}.png"
        with Image.open(thermal_path) as thermal:
            size = thermal.size
            thermal.save(out_thermal / name)
        with Image.open(rgb_path) as rgb:
            rgb.resize(size, Image.Resampling.LANCZOS).save(out_rgb / name)
    return len(rgb_frames)


def process(path_to_folder: Path) -> None:
    for split in SPLITS:
        n = process_split(Path(path_to_folder), split)
        print(f"{split}: wrote {n} paired frames")


def cli() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("path_to_folder", type=Path, help="capture root directory")
    process(parser.parse_args().path_to_folder)


if __name__ == "__main__":
    cli()
