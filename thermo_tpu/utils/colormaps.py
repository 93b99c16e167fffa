"""Colormaps for rendered modalities.

Equivalent of nerfstudio ``utils/colormaps.py`` as used by the reference:
``apply_float_colormap(..., "gray")`` for thermal eval images
(thermal_nerf_model.py:341-346), matplotlib "magma" for camera-path thermal
renders (renderer.py:164), "inferno" for the ThermoScenes colorized thermal
tooling, turbo-style depth colormap for depth visualization.
"""

from __future__ import annotations

import matplotlib
import numpy as np


def apply_float_colormap(image: np.ndarray, colormap: str = "gray") -> np.ndarray:
    """[H, W, 1] float in [0,1] -> [H, W, 3] float in [0,1]."""
    x = np.clip(np.nan_to_num(image[..., 0]), 0.0, 1.0)
    if colormap == "gray":
        return np.repeat(x[..., None], 3, axis=-1)
    cmap = matplotlib.colormaps[colormap]
    return cmap(x)[..., :3].astype(np.float32)


def apply_depth_colormap(
    depth: np.ndarray,
    accumulation: np.ndarray | None = None,
    near: float | None = None,
    far: float | None = None,
    colormap: str = "turbo",
) -> np.ndarray:
    """nerfstudio apply_depth_colormap: normalize depth to [0,1] then
    colormap; multiply by accumulation when given."""
    d = np.nan_to_num(depth[..., 0])
    near = near if near is not None else float(np.min(d))
    far = far if far is not None else float(np.max(d))
    x = (d - near) / max(far - near, 1e-10)
    x = np.clip(x, 0.0, 1.0)
    out = apply_float_colormap(x[..., None], colormap)
    if accumulation is not None:
        out = out * np.clip(accumulation, 0.0, 1.0)
    return out


def to_uint8(image: np.ndarray) -> np.ndarray:
    return (np.clip(np.nan_to_num(image), 0.0, 1.0) * 255).astype(np.uint8)
