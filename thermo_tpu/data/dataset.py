"""Image datasets: RGB + thermal ground truth, cached as device-ready stacks.

TPU-native equivalent of thermo_nerf/thermal_nerf/thermal_dataset.py
(``ThermalDataset``: grayscale thermal GT /255, resized to the RGB size,
shape (H, W, 1)) and thermo_nerf/rgb_concat/concat_dataset.py
(``ConcatDataset``: thermal found in a sibling ``thermal/`` dir by stem,
stacked as a 4th channel).

Design departure from the reference's per-item torch Dataset: images are
decoded once on host (PIL instead of cv2 — cv2 is not in this image) into a
single uint8 array ``[N, H, W, C]``. The trainer uploads that stack to HBM
once; the uint8 -> float /255 conversion and the per-step pixel gather run
on device inside the jitted train step.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import numpy as np
from PIL import Image

from thermo_tpu.data.dataparser import DataparserOutputs


def load_rgb_uint8(path: Path) -> np.ndarray:
    """[H, W, 3] uint8."""
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def load_grayscale_uint8(path: Path, size_wh: Optional[tuple[int, int]] = None) -> np.ndarray:
    """[H, W, 1] uint8 grayscale; optional resize to (width, height).

    Matches ThermalDataset.get_thermal_tensors_from_path semantics
    (cv2 IMREAD_GRAYSCALE + resize + /255 — the /255 happens on device).
    """
    with Image.open(path) as im:
        g = im.convert("L")
        if size_wh is not None and g.size != size_wh:
            g = g.resize(size_wh, Image.BILINEAR)
        return np.asarray(g, dtype=np.uint8)[..., None]


def find_sibling_thermal(image_path: Path) -> Path:
    """ConcatDataset.get_numpy_image:28-39 — look up ``../thermal/<stem>.*``
    next to the RGB image's parent directory."""
    thermal_dir = image_path.parent.parent / "thermal"
    matches = sorted(thermal_dir.glob(image_path.stem + ".*"))
    if not matches:
        raise FileNotFoundError(f"no thermal match for {image_path} in {thermal_dir}")
    return matches[0]


@dataclasses.dataclass
class ImageStack:
    """Host-cached dataset split ready for device upload."""

    images: np.ndarray  # [N, H, W, 3] uint8
    thermal: Optional[np.ndarray]  # [N, H, W, 1] uint8 or None
    height: int
    width: int

    @property
    def num_images(self) -> int:
        return self.images.shape[0]


def load_image_stack(
    outputs: DataparserOutputs,
    concat_thermal_from_sibling: bool = False,
) -> ImageStack:
    """Decode all split images (and thermal GT when present) into stacks.

    All images in a split must share one resolution (true for ThermoScenes
    after the rename/rescale preprocessing; asserted here).
    """
    rgbs = [load_rgb_uint8(p) for p in outputs.image_filenames]
    shapes = {im.shape for im in rgbs}
    if len(shapes) != 1:
        raise ValueError(f"all images must share a resolution; got {shapes}")
    images = np.stack(rgbs)
    h, w = images.shape[1:3]

    thermal = None
    if outputs.thermal_filenames:
        thermal = np.stack(
            [load_grayscale_uint8(p, (w, h)) for p in outputs.thermal_filenames]
        )
    elif concat_thermal_from_sibling:
        thermal = np.stack(
            [
                load_grayscale_uint8(find_sibling_thermal(p), (w, h))
                for p in outputs.image_filenames
            ]
        )
    return ImageStack(images=images, thermal=thermal, height=h, width=w)
