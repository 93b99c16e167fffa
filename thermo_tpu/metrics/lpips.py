"""LPIPS (Learned Perceptual Image Patch Similarity), AlexNet backbone.

The reference uses torchmetrics' LPIPS with pretrained AlexNet
(thermal_nerf_model.py:33,202,384; normalize=True). Pretrained weights
cannot be downloaded in a zero-egress TPU environment, so this module
implements the exact LPIPS-alex architecture in JAX and loads weights from
an ``.npz`` file when available (documented metric substitution, SURVEY §7):

  * convert once, anywhere with torch+lpips installed:
      ``python -m thermo_tpu.metrics.lpips export /path/lpips_alex.npz``
  * point ``THERMO_TPU_LPIPS_WEIGHTS`` at the file (or pass ``weights_path``).

Without weights, ``lpips_fn()`` returns None, logs a LOUD warning, and
evaluators omit the metric (metrics.json simply lacks the lpips keys).

Integrity: a loaded npz is validated against ``weight_manifest()`` (keys and
shapes) and its sha256 is logged; set ``THERMO_TPU_LPIPS_SHA256`` to pin a
known-good digest (loading aborts on mismatch). Export your own npz with the
helper below and record `sha256sum lpips_alex.npz` next to it — the digest
depends on the lpips pip release that produced it, so no single upstream
value is canonical.

Expected npz keys: ``features.{0,3,6,8,10}.{weight,bias}`` (AlexNet convs,
OIHW) and ``lins.{0..4}.weight`` (1x1 LPIPS heads), the standard
richzhang/PerceptualSimilarity parameterization.
"""

from __future__ import annotations

import hashlib
import logging
import os
from pathlib import Path
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

# AlexNet feature extraction config: (out_ch, kernel, stride, padding)
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_CONV_KEYS = [0, 3, 6, 8, 10]
# Max-pool after conv indices 0, 1 (and 4 in torchvision, but LPIPS taps
# activations before that pool).
_POOL_AFTER = {0, 1}

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _load_weights(path: Path) -> dict:
    data = np.load(path)
    return {k: np.asarray(data[k]) for k in data.files}


def weight_manifest() -> dict[str, tuple]:
    """Expected npz keys -> shapes (OIHW convs; [C] biases; [C] lin heads)."""
    in_ch = 3
    manifest: dict[str, tuple] = {}
    for i, (out_ch, k, _, _) in enumerate(_ALEX_CONVS):
        manifest[f"features.{_CONV_KEYS[i]}.weight"] = (out_ch, in_ch, k, k)
        manifest[f"features.{_CONV_KEYS[i]}.bias"] = (out_ch,)
        manifest[f"lins.{i}.weight"] = (out_ch,)
        in_ch = out_ch
    return manifest


def random_weights(seed: int = 0) -> dict[str, np.ndarray]:
    """Correctly-shaped random weight set (for structural tests)."""
    rng = np.random.default_rng(seed)
    out = {}
    for key, shape in weight_manifest().items():
        w = rng.normal(scale=0.1, size=shape).astype(np.float32)
        if key.startswith("lins"):
            w = np.abs(w)  # LPIPS heads are non-negative
        out[key] = w
    return out


def lpips_fn(
    weights_path: Optional[str] = None,
) -> Optional[Callable[[Array, Array], Array]]:
    """Build the LPIPS distance function, or None when weights are absent.

    The returned fn takes two [H, W, 3] images in [0, 1] (normalize=True
    semantics) and returns a scalar distance.
    """
    path = weights_path or os.environ.get("THERMO_TPU_LPIPS_WEIGHTS")
    if not path or not Path(path).exists():
        logging.getLogger(__name__).warning(
            "LPIPS weights not found (%s): the lpips/lpips_thermal metrics "
            "will be OMITTED from metrics.json. The reference reports LPIPS "
            "(torchmetrics LPIPS-alex, thermal_nerf_model.py:33,202); to "
            "enable it, export weights once with "
            "`python -m thermo_tpu.metrics.lpips export lpips_alex.npz` on a "
            "machine with the `lpips` pip package and point "
            "THERMO_TPU_LPIPS_WEIGHTS at the file.",
            path or "THERMO_TPU_LPIPS_WEIGHTS unset",
        )
        return None
    digest = hashlib.sha256(Path(path).read_bytes()).hexdigest()
    pinned = os.environ.get("THERMO_TPU_LPIPS_SHA256")
    if pinned and digest != pinned.lower():
        raise ValueError(
            f"LPIPS weights {path} sha256 {digest} != pinned "
            f"THERMO_TPU_LPIPS_SHA256 {pinned}"
        )
    logging.getLogger(__name__).info("LPIPS weights %s sha256=%s", path, digest)
    w = _load_weights(Path(path))
    manifest = weight_manifest()
    missing = sorted(set(manifest) - set(w))
    if missing:
        raise ValueError(f"LPIPS weights {path} missing keys: {missing}")
    for key, shape in manifest.items():
        if tuple(w[key].reshape(-1).shape if key.startswith("lins") else w[key].shape) != tuple(
            (int(np.prod(shape)),) if key.startswith("lins") else shape
        ):
            raise ValueError(
                f"LPIPS weights {path}: {key} has shape {w[key].shape}, "
                f"expected {shape}"
            )

    def alex_features(x: Array) -> list[Array]:
        # x: [1, H, W, 3] in [-1, 1]
        x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
        feats = []
        for i, (out_ch, k, s, p) in enumerate(_ALEX_CONVS):
            kernel = jnp.asarray(w[f"features.{_CONV_KEYS[i]}.weight"])  # OIHW
            bias = jnp.asarray(w[f"features.{_CONV_KEYS[i]}.bias"])
            kernel = jnp.transpose(kernel, (2, 3, 1, 0))  # HWIO
            x = jax.lax.conv_general_dilated(
                x, kernel, (s, s), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
            x = jax.nn.relu(x)
            feats.append(x)
            if i in _POOL_AFTER:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
                )
        return feats

    def distance(img0: Array, img1: Array) -> Array:
        a = img0[None] * 2.0 - 1.0
        b = img1[None] * 2.0 - 1.0
        fa, fb = alex_features(a), alex_features(b)
        total = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            # richzhang normalize_tensor: x / (||x||_2 + eps), eps OUTSIDE
            # the sqrt (PerceptualSimilarity lpips/__init__.py)
            xn = x / (jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True)) + 1e-10)
            yn = y / (jnp.sqrt(jnp.sum(y**2, axis=-1, keepdims=True)) + 1e-10)
            diff = (xn - yn) ** 2
            lin = jnp.asarray(w[f"lins.{i}.weight"]).reshape(-1)  # [C]
            # 1x1 conv with non-negative weights, then spatial mean
            total = total + jnp.mean(jnp.sum(diff * lin, axis=-1))
        return total

    return jax.jit(distance)


def export_from_torch(out_path: str) -> None:  # pragma: no cover
    """Helper to run OUTSIDE this environment (needs torch + lpips pip pkg)."""
    import lpips as lpips_pkg  # type: ignore

    net = lpips_pkg.LPIPS(net="alex")
    out = {}
    alex = net.net.slice1  # noqa: F841 — structure varies; use state_dict walk
    sd = net.state_dict()
    # torchvision alexnet features inside lpips: net.net.(slices); lins.N.model.1.weight
    conv_i = 0
    for k, v in sd.items():
        if ".model.1.weight" in k and k.startswith("lin"):
            idx = int(k.split(".")[0][3:])
            out[f"lins.{idx}.weight"] = v.detach().numpy()
        if "net." in k and k.endswith("weight") and v.ndim == 4:
            out[f"features.{_CONV_KEYS[conv_i]}.weight"] = v.detach().numpy()
            conv_i += 1
        if "net." in k and k.endswith("bias") and v.ndim == 1:
            ci = conv_i - 1
            out[f"features.{_CONV_KEYS[ci]}.bias"] = v.detach().numpy()
    np.savez(out_path, **out)


if __name__ == "__main__":  # pragma: no cover
    import sys

    if len(sys.argv) == 3 and sys.argv[1] == "export":
        export_from_torch(sys.argv[2])
