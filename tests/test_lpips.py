"""Structural + numerical verification of the JAX LPIPS-alex implementation.

The pretrained weights cannot be fetched here (zero egress), but torch (cpu)
is available, so the conv/pool/normalize semantics are verified against an
independent torch-functional forward of the richzhang PerceptualSimilarity
architecture (lpips pkg, net='alex', normalize=True — the torchmetrics
backend the reference binds at thermal_nerf_model.py:202) using random
weights of the correct shapes. A hardcoded golden value pins the result
against drift in BOTH implementations.
"""

from __future__ import annotations

import numpy as np
import pytest

from thermo_tpu.metrics.lpips import lpips_fn, random_weights, weight_manifest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

_CONV_KEYS = [0, 3, 6, 8, 10]
_STRIDE_PAD = [(4, 2), (1, 2), (1, 1), (1, 1), (1, 1)]


def torch_lpips_oracle(w: dict, img0: np.ndarray, img1: np.ndarray) -> float:
    """Independent torch-functional LPIPS-alex (NCHW), normalize=True."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def features(img: np.ndarray) -> list:
        x = torch.from_numpy(np.moveaxis(img, -1, 0)[None].astype(np.float32))
        x = x * 2.0 - 1.0  # normalize=True: [0,1] -> [-1,1]
        x = (x - shift) / scale
        taps = []
        for i, key in enumerate(_CONV_KEYS):
            s, p = _STRIDE_PAD[i]
            x = F.relu(
                F.conv2d(
                    x,
                    torch.from_numpy(w[f"features.{key}.weight"]),
                    torch.from_numpy(w[f"features.{key}.bias"]),
                    stride=s,
                    padding=p,
                )
            )
            taps.append(x)
            if i in (0, 1):
                x = F.max_pool2d(x, kernel_size=3, stride=2)
        return taps

    fa, fb = features(img0), features(img1)
    total = 0.0
    for i, (a, b) in enumerate(zip(fa, fb)):
        na = a / (a.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        nb = b / (b.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        lin = torch.from_numpy(w[f"lins.{i}.weight"]).view(1, -1, 1, 1)
        total += float(((na - nb) ** 2 * lin).sum(dim=1, keepdim=True).mean())
    return total


@pytest.fixture(scope="module")
def weights_npz(tmp_path_factory):
    path = tmp_path_factory.mktemp("lpips") / "lpips_random.npz"
    np.savez(path, **random_weights(seed=0))
    return str(path)


class TestLPIPS:
    def test_shape_manifest(self):
        manifest = weight_manifest()
        # AlexNet channel progression and the 5 LPIPS heads
        assert manifest["features.0.weight"] == (64, 3, 11, 11)
        assert manifest["features.3.weight"] == (192, 64, 5, 5)
        assert manifest["features.6.weight"] == (384, 192, 3, 3)
        assert manifest["features.8.weight"] == (256, 384, 3, 3)
        assert manifest["features.10.weight"] == (256, 256, 3, 3)
        assert [manifest[f"lins.{i}.weight"] for i in range(5)] == [
            (64,), (192,), (384,), (256,), (256,)
        ]
        w = random_weights()
        assert set(w) == set(manifest)
        for k, v in w.items():
            assert v.shape == manifest[k]

    def test_missing_weights_returns_none(self):
        assert lpips_fn(weights_path=None) is None
        assert lpips_fn(weights_path="/nonexistent/file.npz") is None

    def test_matches_torch_oracle(self, weights_npz):
        fn = lpips_fn(weights_path=weights_npz)
        assert fn is not None
        rng = np.random.default_rng(3)
        img0 = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        img1 = np.clip(img0 + rng.normal(scale=0.05, size=img0.shape), 0, 1).astype(
            np.float32
        )
        got = float(fn(img0, img1))
        want = torch_lpips_oracle(random_weights(seed=0), img0, img1)
        assert got == pytest.approx(want, rel=1e-4)

    def test_identity_is_zero(self, weights_npz):
        fn = lpips_fn(weights_path=weights_npz)
        img = np.random.default_rng(1).uniform(size=(64, 64, 3)).astype(np.float32)
        assert float(fn(img, img)) == pytest.approx(0.0, abs=1e-6)

    def test_golden_value_pinned(self, weights_npz):
        """Golden value computed once from the torch oracle (seed-0 weights,
        seed-3 images) — catches silent drift in either implementation."""
        fn = lpips_fn(weights_path=weights_npz)
        rng = np.random.default_rng(3)
        img0 = rng.uniform(size=(64, 64, 3)).astype(np.float32)
        img1 = np.clip(img0 + rng.normal(scale=0.05, size=img0.shape), 0, 1).astype(
            np.float32
        )
        got = float(fn(img0, img1))
        assert got == pytest.approx(GOLDEN_SEED0_SEED3, rel=1e-3)


# computed once from the torch oracle (seed-0 weights, seed-3 images)
GOLDEN_SEED0_SEED3 = 0.0034992143337149173
