"""COLMAP glue: run SfM and convert the binary model to transforms.json.

TPU-native equivalent of the nerfstudio ``ImagesToNerfstudioDataset`` /
``colmap_utils`` path used by thermo_scenes/scripts/images_to_nerf_dataset.py
(COLMAP itself stays an external binary, SURVEY §2b). Implements:
  * the COLMAP binary model readers (cameras.bin / images.bin — standard
    format, little-endian),
  * ``colmap_to_json``: COLMAP world-to-camera (qvec, tvec) -> OpenGL c2w
    with the nerfstudio axis flip and ``applied_transform`` bookkeeping,
  * a subprocess pipeline (feature_extractor -> exhaustive_matcher ->
    mapper) gated on the ``colmap`` binary being present.
"""

from __future__ import annotations

import json
import shutil
import struct
import subprocess
from pathlib import Path

import numpy as np

CAMERA_MODEL_NAMES = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}


def qvec2rotmat(qvec: np.ndarray) -> np.ndarray:
    w, x, y, z = qvec
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
            [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
            [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def read_cameras_binary(path: Path) -> dict:
    cameras = {}
    with open(path, "rb") as f:
        (num,) = struct.unpack("<Q", f.read(8))
        for _ in range(num):
            cam_id, model_id, w, h = struct.unpack("<iiQQ", f.read(24))
            name, n_params = CAMERA_MODEL_NAMES[model_id]
            params = struct.unpack("<" + "d" * n_params, f.read(8 * n_params))
            cameras[cam_id] = dict(
                model=name, width=int(w), height=int(h), params=list(params)
            )
    return cameras


def read_images_binary(path: Path) -> dict:
    images = {}
    with open(path, "rb") as f:
        (num,) = struct.unpack("<Q", f.read(8))
        for _ in range(num):
            img_id = struct.unpack("<i", f.read(4))[0]
            qvec = np.array(struct.unpack("<dddd", f.read(32)))
            tvec = np.array(struct.unpack("<ddd", f.read(24)))
            cam_id = struct.unpack("<i", f.read(4))[0]
            name = b""
            while True:
                c = f.read(1)
                if c == b"\x00":
                    break
                name += c
            (num_pts,) = struct.unpack("<Q", f.read(8))
            f.read(24 * num_pts)  # skip 2D points
            images[img_id] = dict(
                qvec=qvec, tvec=tvec, camera_id=cam_id, name=name.decode()
            )
    return images


def colmap_to_json(recon_dir: Path, output_dir: Path) -> int:
    """cameras.bin + images.bin -> transforms.json (nerfstudio conventions:
    COLMAP w2c inverted to c2w, y/z rows flipped to OpenGL, then the world
    rotated so COLMAP's -y-up becomes +z-up; recorded as applied_transform)."""
    cameras = read_cameras_binary(recon_dir / "cameras.bin")
    images = read_images_binary(recon_dir / "images.bin")
    frames = []
    cam = cameras[next(iter(cameras))]
    for img in sorted(images.values(), key=lambda im: im["name"]):
        rotation = qvec2rotmat(img["qvec"])
        translation = img["tvec"].reshape(3, 1)
        w2c = np.concatenate([rotation, translation], 1)
        w2c = np.concatenate([w2c, np.array([[0, 0, 0, 1.0]])], 0)
        c2w = np.linalg.inv(w2c)
        c2w[0:3, 1:3] *= -1  # OpenCV cam -> OpenGL cam
        c2w = c2w[np.array([0, 2, 1, 3]), :]  # swap y/z world axes
        c2w[2, :] *= -1  # flip z (gravity down -> up)
        frames.append(
            {
                "file_path": f"images/{img['name']}",
                "transform_matrix": c2w.tolist(),
                "colmap_im_id": int(
                    [k for k, v in images.items() if v is img][0]
                ),
            }
        )
    params = cam["params"]
    if cam["model"] == "OPENCV":
        fl_x, fl_y, cx, cy, k1, k2, p1, p2 = params
        dist = dict(k1=k1, k2=k2, p1=p1, p2=p2)
    elif cam["model"] == "PINHOLE":
        fl_x, fl_y, cx, cy = params
        dist = dict(k1=0.0, k2=0.0, p1=0.0, p2=0.0)
    elif cam["model"] == "SIMPLE_PINHOLE":
        fl_x, cx, cy = params
        fl_y = fl_x
        dist = dict(k1=0.0, k2=0.0, p1=0.0, p2=0.0)
    elif cam["model"] == "SIMPLE_RADIAL":
        fl_x, cx, cy, k1 = params
        fl_y = fl_x
        dist = dict(k1=k1, k2=0.0, p1=0.0, p2=0.0)
    else:
        raise NotImplementedError(f"camera model {cam['model']} not supported")

    applied_transform = np.eye(4)[:3]
    applied_transform = applied_transform[np.array([0, 2, 1]), :]
    applied_transform[2, :] *= -1

    out = {
        "w": cam["width"],
        "h": cam["height"],
        "fl_x": fl_x,
        "fl_y": fl_y,
        "cx": cx,
        "cy": cy,
        **dist,
        "camera_model": "OPENCV",
        "frames": frames,
        "applied_transform": applied_transform.tolist(),
    }
    output_dir.mkdir(parents=True, exist_ok=True)
    (output_dir / "transforms.json").write_text(json.dumps(out, indent=4))
    return len(frames)


def run_colmap(image_dir: Path, workspace: Path, camera_model: str = "OPENCV") -> Path:
    """feature_extractor -> exhaustive_matcher -> mapper. Returns the sparse
    reconstruction dir. Requires the ``colmap`` binary on PATH."""
    if shutil.which("colmap") is None:
        raise RuntimeError(
            "COLMAP binary not found on PATH. COLMAP is an external "
            "preprocessing dependency (install from colmap.github.io)."
        )
    workspace.mkdir(parents=True, exist_ok=True)
    db = workspace / "database.db"
    sparse = workspace / "sparse"
    sparse.mkdir(exist_ok=True)
    subprocess.run(
        ["colmap", "feature_extractor", "--database_path", str(db),
         "--image_path", str(image_dir),
         "--ImageReader.camera_model", camera_model,
         "--ImageReader.single_camera", "1"],
        check=True,
    )
    subprocess.run(
        ["colmap", "exhaustive_matcher", "--database_path", str(db)], check=True
    )
    subprocess.run(
        ["colmap", "mapper", "--database_path", str(db),
         "--image_path", str(image_dir), "--output_path", str(sparse)],
        check=True,
    )
    return sparse / "0"
