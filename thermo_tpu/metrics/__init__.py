"""Image metrics: PSNR / SSIM / thermal MAE / Otsu threshold / LPIPS."""

from thermo_tpu.metrics.image_metrics import mae_thermal, psnr, ssim
from thermo_tpu.metrics.otsu import calculate_threshold, otsu_threshold

__all__ = ["psnr", "ssim", "mae_thermal", "otsu_threshold", "calculate_threshold"]
