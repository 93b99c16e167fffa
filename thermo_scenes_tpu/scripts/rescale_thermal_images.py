"""Re-express eval thermal images in the train split's temperature bounds.

Capability parity with thermo_scenes/scripts/rescale_thermal_images.py: an
eval image normalized against its own (t_min, t_max) bounds is remapped so
its pixel values are normalized against the train bounds (t_min_new,
t_max_new) instead, clipped to [0, 1].

The two-step scale/unscale of the reference collapses to a single affine map
pixel -> pixel * gain + offset with
``gain = (t_max - t_min) / (t_max_new - t_min_new)`` and
``offset = (t_min - t_min_new) / (t_max_new - t_min_new)``, which is what we
compute here.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image

_SUFFIXES = {".png", ".jpg", ".jpeg"}


def bounds_remap(t_min: float, t_max: float, t_min_new: float, t_max_new: float):
    """Return (gain, offset) of the affine map between the two normalizations."""
    span_new = t_max_new - t_min_new
    return (t_max - t_min) / span_new, (t_min - t_min_new) / span_new


def remap_array(values: np.ndarray, gain: float, offset: float) -> np.ndarray:
    """Apply the affine remap to [0, 1] values and clip back into [0, 1]."""
    return np.clip(values * gain + offset, 0.0, 1.0)


def scale_test_to_train(img, t_min, t_max, t_min_new, t_max_new):
    """Remap one PIL image from (t_min, t_max) bounds to (t_min_new, t_max_new)."""
    gain, offset = bounds_remap(t_min, t_max, t_min_new, t_max_new)
    normalized = np.asarray(img, dtype=np.float64) / 255.0
    remapped = remap_array(normalized, gain, offset)
    return Image.fromarray((remapped * 255).astype(np.uint8))


def process_images(
    input_folder: Path,
    output_folder: Path,
    t_min: float,
    t_max: float,
    t_min_new: float,
    t_max_new: float,
) -> None:
    output_folder = Path(output_folder)
    output_folder.mkdir(parents=True, exist_ok=True)
    for path in sorted(Path(input_folder).iterdir()):
        if path.suffix.lower() not in _SUFFIXES:
            continue
        with Image.open(path) as img:
            out = scale_test_to_train(img.convert("RGB"), t_min, t_max, t_min_new, t_max_new)
        out.save(output_folder / path.name)


def cli() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input-folder", type=Path, required=True)
    parser.add_argument("--output-folder", type=Path, required=True)
    parser.add_argument("--t-min", type=float, required=True, help="eval bounds min")
    parser.add_argument("--t-max", type=float, required=True, help="eval bounds max")
    parser.add_argument("--t-min-new", type=float, required=True, help="train bounds min")
    parser.add_argument("--t-max-new", type=float, required=True, help="train bounds max")
    a = parser.parse_args()
    process_images(a.input_folder, a.output_folder, a.t_min, a.t_max, a.t_min_new, a.t_max_new)


if __name__ == "__main__":
    cli()
