"""Camera-path JSON loading.

Equivalent of nerfstudio ``get_path_from_json`` as used by the reference's
Renderer.load_cameras (renderer.py:143-158). Schema (verified against the
reference fixture tests/data/trajectories/camera_path_facade_2.json):
top-level ``camera_type`` ("perspective"), ``render_height``/``render_width``,
``fps``, ``seconds``, and ``camera_path`` = list of
``{camera_to_world: 16 floats (row-major 4x4), fov (deg, vertical), aspect}``.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

import numpy as np

from thermo_tpu.data.cameras import Cameras


def three_js_perspective_camera_focal_length(fov_deg: float, image_height: int) -> float:
    """nerfstudio cameras/camera_paths.py helper: vertical-FOV -> focal px."""
    return image_height / (2.0 * math.tan(math.radians(fov_deg) / 2.0))


def load_camera_path(path: Path) -> tuple[Cameras, dict]:
    """Returns (Cameras, meta) where meta holds fps/seconds/etc."""
    d = json.loads(Path(path).read_text())
    height = int(d["render_height"])
    width = int(d["render_width"])
    frames = d["camera_path"]

    c2ws = []
    fxs, fys = [], []
    for frame in frames:
        c2w = np.asarray(frame["camera_to_world"], np.float32).reshape(4, 4)[:3]
        c2ws.append(c2w)
        focal = three_js_perspective_camera_focal_length(float(frame["fov"]), height)
        fxs.append(focal)
        fys.append(focal)

    n = len(frames)
    cameras = Cameras.from_numpy(
        fx=np.asarray(fxs, np.float32),
        fy=np.asarray(fys, np.float32),
        cx=np.full(n, width / 2.0, np.float32),
        cy=np.full(n, height / 2.0, np.float32),
        width=np.full(n, width, np.int32),
        height=np.full(n, height, np.int32),
        c2w=np.stack(c2ws),
    )
    meta = {
        "fps": float(d.get("fps", 24.0)),
        "seconds": float(d.get("seconds", n / float(d.get("fps", 24.0)))),
        "camera_type": d.get("camera_type", "perspective"),
    }
    return cameras, meta
