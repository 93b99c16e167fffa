"""Image quality metrics.

TPU-native equivalents of the metrics bound by the reference
(thermal_nerf_model.py:200-202, 362-391):
  * psnr — torchmetrics PeakSignalNoiseRatio(data_range=1.0)
  * ssim — torchmetrics.functional structural_similarity_index_measure with
    its defaults (gaussian kernel 11, sigma 1.5, k1 0.01, k2 0.03,
    data_range=None -> max-min over preds/target)
  * mae_thermal — thermo_nerf/thermal_nerf/thermal_metrics.py:5-34
    (optional Otsu foreground mask, denormalize to degC by
    ``* (max-min) + min``)
  * lpips — see ``thermo_tpu.metrics.lpips`` (pretrained AlexNet weights are
    not obtainable in a zero-egress environment; the metric is emitted only
    when weights are supplied — a documented substitution per SURVEY §7).

All metrics take [H, W, C] float arrays in [0, 1] (channel-last; the
reference's [1, C, H, W] moveaxis dance is an implementation detail of
torchmetrics, not of the math).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from jax import Array


def psnr(pred: Array, gt: Array, data_range: float = 1.0) -> Array:
    m = jnp.mean(jnp.square(pred - gt))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(m, 1e-12))


def _gaussian_1d(kernel_size: int, sigma: float) -> np.ndarray:
    ax = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2.0
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    return g / g.sum()


def _gaussian_filter_valid(x: np.ndarray, g: np.ndarray) -> np.ndarray:
    """Separable 2-D gaussian, VALID region, over [H, W, C] float64."""
    from numpy.lib.stride_tricks import sliding_window_view

    w = sliding_window_view(x, len(g), axis=0)  # [H', W, C, k]
    x = np.tensordot(w, g, axes=([3], [0]))
    w = sliding_window_view(x, len(g), axis=1)  # [H', W', C, k]
    return np.tensordot(w, g, axes=([3], [0]))


def ssim(
    pred,
    gt,
    data_range: Optional[float] = None,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> np.float64:
    """SSIM over [H, W, C] images, mean over valid windows and channels.

    Matches torchmetrics ``structural_similarity_index_measure`` defaults
    (gaussian 11x11 sigma 1.5, k1=0.01, k2=0.03; ``data_range=None`` -> the
    larger of the two images' max-min, as the reference binds it at
    thermal_nerf_model.py:201,363), with explicit deviations for stability:

      * computed host-side in **float64** — the fp32 ``E[x^2] - E[x]^2``
        cancellation produced |SSIM| > 1 on low-dynamic-range renders
        (round-2 regression);
      * per-window variances are clamped to >= 0;
      * a ``data_range`` of exactly 0 (two identical constant images) returns
        1.0 instead of torchmetrics' nan.

    With these guards the result is always in [-1, 1].
    """
    pred = np.asarray(pred, dtype=np.float64)
    gt = np.asarray(gt, dtype=np.float64)
    if pred.ndim == 2:
        pred, gt = pred[..., None], gt[..., None]
    if data_range is None:
        data_range = max(
            float(pred.max() - pred.min()), float(gt.max() - gt.min())
        )
    if data_range == 0.0:
        return np.float64(1.0) if np.array_equal(pred, gt) else np.float64(0.0)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    g = _gaussian_1d(kernel_size, sigma)
    mu_p = _gaussian_filter_valid(pred, g)
    mu_g = _gaussian_filter_valid(gt, g)
    sigma_p = np.maximum(_gaussian_filter_valid(pred * pred, g) - mu_p * mu_p, 0.0)
    sigma_g = np.maximum(_gaussian_filter_valid(gt * gt, g) - mu_g * mu_g, 0.0)
    sigma_pg = _gaussian_filter_valid(pred * gt, g) - mu_p * mu_g

    num = (2 * mu_p * mu_g + c1) * (2 * sigma_pg + c2)
    den = (mu_p**2 + mu_g**2 + c1) * (sigma_p + sigma_g + c2)
    return np.float64(np.mean(num / den))


def mae_thermal(
    gt: Array,
    pred: Array,
    cold: bool,
    max_temperature: float,
    min_temperature: float,
    threshold: Optional[float] = None,
) -> Array:
    """Thermal MAE in degC (thermal_metrics.py:5-34).

    With a threshold, only foreground pixels count: ``gt < threshold`` when
    the target is colder than ambient, ``gt > threshold`` otherwise.
    Implemented as a mask (static shapes) rather than boolean indexing.
    """
    scale = max_temperature - min_temperature
    err = jnp.abs(gt - pred) * scale
    if threshold:
        mask = (gt < threshold) if cold else (gt > threshold)
        count = jnp.maximum(jnp.sum(mask), 1)
        return jnp.sum(err * mask) / count
    return jnp.mean(err)
