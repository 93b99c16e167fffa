"""Golden + property tests for image metrics (SSIM stability, PSNR, MAE).

SSIM is pinned three ways:
  * analytically (constant images, identity);
  * against an independent direct per-window float64 oracle that computes
    weighted moments E[w (x - mu)^2] without the E[x^2] - E[x]^2 shortcut;
  * against hardcoded golden values so algorithm drift is caught.

The dark/low-dynamic-range cases reproduce the round-2 regression where the
fp32 variance cancellation produced |SSIM| > 1.
"""

from __future__ import annotations

import numpy as np
import pytest

from thermo_tpu.metrics.image_metrics import mae_thermal, psnr, ssim


def _gauss1d(k: int, sigma: float) -> np.ndarray:
    ax = np.arange(k, dtype=np.float64) - (k - 1) / 2.0
    g = np.exp(-0.5 * (ax / sigma) ** 2)
    return g / g.sum()


def ssim_direct_oracle(pred, gt, data_range, k=11, sigma=1.5, k1=0.01, k2=0.03):
    """Per-window SSIM via centered weighted moments (independent path)."""
    pred = np.asarray(pred, np.float64)
    gt = np.asarray(gt, np.float64)
    g1 = _gauss1d(k, sigma)
    w = np.outer(g1, g1)  # [k, k], sums to 1
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    H, W, C = pred.shape
    vals = []
    for c in range(C):
        for i in range(H - k + 1):
            for j in range(W - k + 1):
                p = pred[i : i + k, j : j + k, c]
                t = gt[i : i + k, j : j + k, c]
                mp, mt = (w * p).sum(), (w * t).sum()
                vp = (w * (p - mp) ** 2).sum()
                vt = (w * (t - mt) ** 2).sum()
                cov = (w * (p - mp) * (t - mt)).sum()
                vals.append(
                    (2 * mp * mt + c1)
                    * (2 * cov + c2)
                    / ((mp**2 + mt**2 + c1) * (vp + vt + c2))
                )
    return float(np.mean(vals))


class TestSSIM:
    def test_identity_is_one(self):
        img = np.random.default_rng(0).uniform(size=(16, 16, 3))
        assert float(ssim(img, img)) == pytest.approx(1.0, abs=1e-12)

    def test_constant_images_analytic(self):
        # variance terms vanish; SSIM = (2ab + c1) / (a^2 + b^2 + c1)
        a, b = 0.25, 0.5
        c1 = (0.01 * 1.0) ** 2
        expected = (2 * a * b + c1) / (a * a + b * b + c1)
        got = float(ssim(np.full((16, 16, 1), a), np.full((16, 16, 1), b), data_range=1.0))
        assert got == pytest.approx(expected, rel=1e-12)

    def test_identical_constants_zero_range(self):
        img = np.full((12, 12, 1), 0.3)
        assert float(ssim(img, img)) == 1.0

    def test_matches_direct_oracle_normal_range(self):
        rng = np.random.default_rng(42)
        a = rng.uniform(size=(16, 16, 2))
        b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1)
        dr = max(a.max() - a.min(), b.max() - b.min())
        assert float(ssim(a, b)) == pytest.approx(
            ssim_direct_oracle(a, b, dr), rel=1e-9
        )

    def test_matches_direct_oracle_dark_low_range(self):
        # the round-2 failure regime: nearly-black renders, tiny dynamic range
        rng = np.random.default_rng(7)
        a = rng.uniform(size=(16, 16, 1)) * 2e-3
        b = np.clip(a + rng.normal(scale=2e-4, size=a.shape), 0, None)
        dr = max(a.max() - a.min(), b.max() - b.min())
        got = float(ssim(a, b))
        assert got == pytest.approx(ssim_direct_oracle(a, b, dr), rel=1e-6)
        assert -1.0 <= got <= 1.0

    @pytest.mark.parametrize("seed", range(6))
    def test_always_within_unit_interval(self, seed):
        rng = np.random.default_rng(seed)
        scale = 10.0 ** rng.uniform(-6, 0)
        a = rng.uniform(size=(14, 14, 1)) * scale
        b = np.clip(a + rng.normal(scale=scale / 5, size=a.shape), 0, None)
        got = float(ssim(a, b))
        assert -1.0 <= got <= 1.0, f"|SSIM|>1 at scale {scale}: {got}"

    def test_golden_values_pinned(self):
        rng = np.random.default_rng(42)
        a = rng.uniform(size=(32, 32, 3))
        b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1)
        assert float(ssim(a, b)) == pytest.approx(0.9454803936052661, rel=1e-10)
        base = rng.uniform(size=(32, 32, 1)) * 2e-3
        d2 = np.clip(base + rng.normal(scale=2e-4, size=base.shape), 0, None)
        assert float(ssim(base, d2)) == pytest.approx(0.9451345446774071, rel=1e-10)


class TestPSNRAndMAE:
    def test_psnr_known_value(self):
        a = np.zeros((8, 8, 1), np.float32)
        b = np.full((8, 8, 1), 0.1, np.float32)
        assert float(psnr(a, b)) == pytest.approx(20.0, abs=1e-4)

    def test_mae_denormalizes_to_celsius(self):
        gt = np.full((4, 4, 1), 0.5, np.float32)
        pred = np.full((4, 4, 1), 0.25, np.float32)
        got = float(
            mae_thermal(gt, pred, cold=False, max_temperature=40.0, min_temperature=20.0)
        )
        assert got == pytest.approx(0.25 * 20.0, rel=1e-6)
