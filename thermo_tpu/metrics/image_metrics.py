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

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def psnr(pred: Array, gt: Array, data_range: float = 1.0) -> Array:
    m = jnp.mean(jnp.square(pred - gt))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(m, 1e-12))


def _gaussian_kernel(kernel_size: int, sigma: float) -> np.ndarray:
    ax = np.arange(kernel_size) - (kernel_size - 1) / 2.0
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(
    pred: Array,
    gt: Array,
    data_range: Optional[float] = None,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> Array:
    """SSIM over [H, W, C] images, mean over valid windows and channels.

    ``data_range=None`` reproduces torchmetrics' default: the larger of the
    two tensors' (max - min).
    """
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    if data_range is None:
        data_range = jnp.maximum(
            jnp.max(pred) - jnp.min(pred), jnp.max(gt) - jnp.min(gt)
        )
        data_range = jnp.maximum(data_range, 1e-6)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    kern = jnp.asarray(_gaussian_kernel(kernel_size, sigma))[..., None, None]

    def filt(x):  # [H, W, C] -> valid-region gaussian blur
        x = jnp.transpose(x, (2, 0, 1))[..., None]  # [C, H, W, 1]
        out = jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out[..., 0]  # [C, H', W']

    mu_p = filt(pred)
    mu_g = filt(gt)
    mu_pp = filt(pred * pred)
    mu_gg = filt(gt * gt)
    mu_pg = filt(pred * gt)

    sigma_p = mu_pp - mu_p * mu_p
    sigma_g = mu_gg - mu_g * mu_g
    sigma_pg = mu_pg - mu_p * mu_g

    num = (2 * mu_p * mu_g + c1) * (2 * sigma_pg + c2)
    den = (mu_p**2 + mu_g**2 + c1) * (sigma_p + sigma_g + c2)
    return jnp.mean(num / den)


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
