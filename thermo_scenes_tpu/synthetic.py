"""Synthetic ThermoScenes-style scene generator: a textured sphere with a
thermal hotspot, rendered analytically (ray-sphere intersection) into a
transforms.json dataset with ``thermal_file_path`` per frame and
train/eval filename split — the shape of data produced by the reference's
thermo_scenes preprocessing (SURVEY §3.5).

Used by the test suite (tests/test_data.py, tests/test_train_e2e.py) and by
``thermo_tpu.scripts.quality_ablation`` for measured speed/quality
trade-off reports on real TPU hardware."""

from __future__ import annotations

import json
import math
from pathlib import Path

import numpy as np
from PIL import Image

SPHERE_RADIUS = 0.5


def look_at_pose(eye: np.ndarray, target: np.ndarray, up=np.array([0.0, 0.0, 1.0])):
    """OpenGL-style c2w (x right, y up, z backward)."""
    forward = target - eye
    forward = forward / np.linalg.norm(forward)
    right = np.cross(forward, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, forward)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -forward
    c2w[:3, 3] = eye
    return c2w


def render_sphere(c2w: np.ndarray, h: int, w: int, f: float):
    """Analytic render: RGB from surface normal, thermal from a hotspot."""
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    cx, cy = w / 2.0, h / 2.0
    dirs_cam = np.stack(
        [(xs + 0.5 - cx) / f, -(ys + 0.5 - cy) / f, -np.ones_like(xs, np.float64)], -1
    )
    R = c2w[:3, :3]
    dirs = dirs_cam @ R.T
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = c2w[:3, 3]

    b = 2.0 * np.sum(dirs * o, axis=-1)
    c = np.dot(o, o) - SPHERE_RADIUS**2
    disc = b * b - 4.0 * c
    hit = disc > 0
    t = np.where(hit, (-b - np.sqrt(np.maximum(disc, 0.0))) / 2.0, 0.0)
    p = o + dirs * t[..., None]
    n = p / SPHERE_RADIUS

    rgb = np.where(hit[..., None], (n * 0.5 + 0.5), 1.0)  # white background
    hotspot = np.exp(-4.0 * np.sum((n - np.array([0.0, 0.0, 1.0])) ** 2, axis=-1))
    thermal = np.where(hit, 0.2 + 0.8 * hotspot, 0.05)
    return (rgb * 255).astype(np.uint8), (thermal * 255).astype(np.uint8)


def make_synthetic_scene(
    root: Path, num_train: int = 10, num_eval: int = 2, size: int = 48
) -> Path:
    root = Path(root)
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "thermal").mkdir(parents=True, exist_ok=True)
    f = size * 1.2
    frames = []
    n_total = num_train + num_eval
    for i in range(n_total):
        phase = 2 * math.pi * i / n_total
        eye = np.array(
            [1.6 * math.cos(phase), 1.6 * math.sin(phase), 0.7 + 0.2 * math.sin(3 * phase)]
        )
        c2w = look_at_pose(eye, np.zeros(3))
        rgb, th = render_sphere(c2w, size, size, f)
        split = "train" if i < num_train else "eval"
        name = f"frame_{split}_{i:05d}.png"
        Image.fromarray(rgb).save(root / "images" / name)
        Image.fromarray(th, mode="L").save(root / "thermal" / name)
        frames.append(
            {
                "file_path": f"images/{name}",
                "thermal_file_path": f"thermal/{name}",
                "transform_matrix": c2w.tolist(),
            }
        )
    meta = {
        "fl_x": f, "fl_y": f, "cx": size / 2.0, "cy": size / 2.0,
        "w": size, "h": size, "camera_model": "OPENCV",
        "frames": frames,
    }
    (root / "transforms.json").write_text(json.dumps(meta, indent=2))
    (root / "temperature_bounds.json").write_text(
        json.dumps({"max_temperature": 30.0, "min_temperature": 10.0})
    )
    return root
