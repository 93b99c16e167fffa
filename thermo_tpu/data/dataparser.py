"""transforms.json dataparser.

TPU-native equivalent of thermo_nerf/thermal_nerf/thermal_dataparser.py
(``Thermal`` / ``ThermalDataParserConfig``, itself a fork of nerfstudio's
``Nerfstudio`` dataparser) plus the nerfstudio camera_utils /
dataparsers_utils helpers it relies on. Pure numpy — runs on host once at
startup.

Semantics preserved exactly (divergence here silently breaks parity):
  * frames sorted by resolved filename (thermal_dataparser.py:103-110);
  * per-frame or global intrinsics and distortion (:84-144);
  * ``thermal_file_path`` collected into metadata (:149-156, :337-341);
  * split via ``{split}_filenames`` lists or eval_mode
    fraction / filename / interval / all (:158-205);
  * ``auto_orient_and_center_poses`` (method "up", center "poses") then
    auto-scale translations to +/-1 (:213-225);
  * scene aabb = [-scene_scale, scene_scale]^3 (:242-251);
  * ``applied_transform`` / ``applied_scale`` folded into the dataparser
    transform (:315-328).
"""

from __future__ import annotations

import dataclasses
import json
import math
from pathlib import Path
from typing import Optional

import numpy as np

_DISTORT_KEYS = ("k1", "k2", "k3", "k4", "p1", "p2")


@dataclasses.dataclass
class DataparserConfig:
    data: Path = Path(".")
    scene_scale: float = 1.0
    scale_factor: float = 1.0
    # None -> auto-discover from image resolution + images_{2,4,8}/ folders
    # (nerfstudio convention; the reference subclass defaults to 1 at
    # thermal_dataparser.py:41 but inherits folder resolution from the
    # nerfstudio Nerfstudio dataparser used at :107,151).
    downscale_factor: Optional[int] = 1
    orientation_method: str = "up"  # "up" | "none" | "vertical" | "pca"
    center_method: str = "poses"  # "poses" | "focus" | "none"
    auto_scale_poses: bool = True
    eval_mode: str = "filename"  # "fraction" | "filename" | "interval" | "all"
    train_split_fraction: float = 0.9
    eval_interval: int = 8


@dataclasses.dataclass
class ParsedCameras:
    """Host-side camera table (numpy)."""

    fx: np.ndarray
    fy: np.ndarray
    cx: np.ndarray
    cy: np.ndarray
    width: np.ndarray
    height: np.ndarray
    c2w: np.ndarray  # [N, 3, 4]
    distortion: np.ndarray  # [N, 6]


@dataclasses.dataclass
class DataparserOutputs:
    image_filenames: list[Path]
    thermal_filenames: list[Path]
    cameras: ParsedCameras
    scene_box_aabb: np.ndarray  # [2, 3]
    dataparser_transform: np.ndarray  # [3, 4]
    dataparser_scale: float


def rotation_matrix_between(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Rotation taking unit vector a to unit vector b (nerfstudio
    camera_utils.rotation_matrix_between)."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    eps = 1e-8
    if np.linalg.norm(v) < eps:
        if c > 0:
            return np.eye(3)
        # 180-degree rotation about any axis orthogonal to a.
        axis = np.cross(a, np.array([1.0, 0.0, 0.0]))
        if np.linalg.norm(axis) < eps:
            axis = np.cross(a, np.array([0.0, 1.0, 0.0]))
        axis = axis / np.linalg.norm(axis)
        return 2.0 * np.outer(axis, axis) - np.eye(3)
    skew = np.array(
        [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], dtype=np.float64
    )
    return np.eye(3) + skew + skew @ skew * (1.0 / (1.0 + c))


def focus_of_attention(poses: np.ndarray, initial: np.ndarray) -> np.ndarray:
    """nerfstudio camera_utils.focus_of_attention: least-squares point closest
    to all camera optical axes."""
    active = np.ones(len(poses), bool)
    fp = initial
    for _ in range(10):
        dirs = poses[active, :3, 2:3]  # -Z is look dir; nerfstudio uses axis 2
        origins = poses[active, :3, 3:4]
        m = np.eye(3) - dirs * np.transpose(dirs, (0, 2, 1))
        mt_m = np.transpose(m, (0, 2, 1)) @ m
        fp = np.linalg.inv(mt_m.mean(0)) @ (mt_m @ origins).mean(0)
        fp = fp[:, 0]
    return fp


def auto_orient_and_center_poses(
    poses: np.ndarray, method: str = "up", center_method: str = "poses"
) -> tuple[np.ndarray, np.ndarray]:
    """nerfstudio camera_utils.auto_orient_and_center_poses.

    ``poses``: [N, 4, 4]. Returns (oriented [N, 3, 4], transform [3, 4]).
    """
    origins = poses[:, :3, 3]
    mean_origin = origins.mean(axis=0)
    if center_method == "poses":
        translation = mean_origin
    elif center_method == "focus":
        translation = focus_of_attention(poses, mean_origin)
    elif center_method == "none":
        translation = np.zeros(3)
    else:
        raise ValueError(f"unknown center_method {center_method!r}")

    if method == "none":
        transform = np.eye(4)[:3]
        transform[:, 3] = -translation
    elif method in ("up", "vertical"):
        up = poses[:, :3, 1].mean(axis=0)
        up = up / np.linalg.norm(up)
        if method == "vertical":
            x_axis_matrix = poses[:, :3, 0]
            _, s, vh = np.linalg.svd(x_axis_matrix, full_matrices=False)
            up_vertical = vh[2, :]
            up = up_vertical if np.dot(up_vertical, up) > 0 else -up_vertical
        rotation = rotation_matrix_between(up, np.array([0.0, 0.0, 1.0]))
        transform = np.concatenate(
            [rotation, rotation @ -translation[:, None]], axis=-1
        )
    elif method == "pca":
        translated = poses[:, :3, 3] - translation
        _, eigvec = np.linalg.eigh(translated.T @ translated)
        eigvec = np.flip(eigvec, axis=-1)
        if np.linalg.det(eigvec) < 0:
            eigvec[:, 2] = -eigvec[:, 2]
        transform = np.concatenate(
            [eigvec.T, eigvec.T @ -translation[:, None]], axis=-1
        )
        oriented = np.einsum(
            "ij,njk->nik",
            np.concatenate([transform, np.array([[0, 0, 0, 1.0]])]),
            poses,
        )[:, :3]
        if oriented.mean(axis=0)[2, 1] < 0:
            oriented[:, 1:3] = -oriented[:, 1:3]
            transform[1:3] = -transform[1:3]
        return oriented, transform
    else:
        raise ValueError(f"unknown orientation method {method!r}")

    oriented = np.einsum("ij,njk->nik", transform, _to_4x4(poses))
    return oriented, transform


def _to_4x4(poses: np.ndarray) -> np.ndarray:
    if poses.shape[-2] == 4:
        return poses
    bottom = np.broadcast_to(np.array([[0, 0, 0, 1.0]]), (*poses.shape[:-2], 1, 4))
    return np.concatenate([poses, bottom], axis=-2)


# ---------------------------------------------------------------------------
# Split helpers (nerfstudio data/utils/dataparsers_utils.py)
# ---------------------------------------------------------------------------


def split_fraction(filenames: list, fraction: float) -> tuple[np.ndarray, np.ndarray]:
    num_images = len(filenames)
    num_train = math.ceil(num_images * fraction)
    i_all = np.arange(num_images)
    i_train = np.linspace(0, num_images - 1, num_train, dtype=int)
    i_eval = np.setdiff1d(i_all, i_train)
    return i_train, i_eval


def split_filename(filenames: list) -> tuple[np.ndarray, np.ndarray]:
    i_train, i_eval = [], []
    for idx, path in enumerate(filenames):
        basename = Path(path).name
        if "train" in basename:
            i_train.append(idx)
        elif "eval" in basename:
            i_eval.append(idx)
        else:
            raise ValueError(
                "frame filename must contain 'train' or 'eval' for "
                f"eval_mode='filename': {basename}"
            )
    return np.array(i_train, dtype=int), np.array(i_eval, dtype=int)


def split_interval(filenames: list, interval: int) -> tuple[np.ndarray, np.ndarray]:
    all_indices = np.arange(len(filenames))
    i_eval = all_indices[all_indices % interval == 0]
    i_train = all_indices[all_indices % interval != 0]
    return i_train, i_eval


def split_all(filenames: list) -> tuple[np.ndarray, np.ndarray]:
    i_all = np.arange(len(filenames))
    return i_all, i_all


# ---------------------------------------------------------------------------
# Main parser
# ---------------------------------------------------------------------------


MAX_AUTO_RESOLUTION = 1600


def _get_fname(
    filepath: Path, data_dir: Path, downscale: int = 1, prefix: str = "images_"
) -> Path:
    """Resolve a frame's file path relative to the dataset dir.

    With ``downscale > 1`` the file is looked up in the nerfstudio-convention
    sibling folder ``{prefix}{downscale}/<name>`` (``images_2/``,
    ``thermal_2/``, ... — thermal_dataparser.py:151-156 uses the
    ``thermal_`` prefix)."""
    if downscale > 1:
        folder = data_dir / f"{prefix}{downscale}"
        if not folder.is_dir():
            raise FileNotFoundError(
                f"downscale_factor={downscale} requires the downsampled image "
                f"folder {folder} (nerfstudio `images_{{factor}}/` layout)"
            )
        return folder / filepath.name
    return data_dir / filepath


def _discover_downscale_factor(meta: dict, data_dir: Path) -> int:
    """Auto-pick the downscale factor the nerfstudio way: halve until the
    longest image side fits MAX_AUTO_RESOLUTION, stopping early if the next
    ``images_{2^k}/`` folder does not exist."""
    frames = meta.get("frames", [])
    if not frames:
        return 1
    probe = data_dir / Path(frames[0]["file_path"])
    if "w" in meta and "h" in meta:
        w, h = int(meta["w"]), int(meta["h"])
    elif "w" in frames[0] and "h" in frames[0]:
        w, h = int(frames[0]["w"]), int(frames[0]["h"])
    elif probe.exists():
        from PIL import Image

        with Image.open(probe) as img:
            w, h = img.size
    else:
        return 1
    factor = 1
    while (
        max(w, h) / factor > MAX_AUTO_RESOLUTION
        and (data_dir / f"images_{factor * 2}").is_dir()
    ):
        factor *= 2
    return factor


def parse_transforms(
    config: DataparserConfig, split: str = "train"
) -> DataparserOutputs:
    data = Path(config.data)
    if data.suffix == ".json":
        meta = json.loads(data.read_text())
        data_dir = data.parent
    else:
        meta = json.loads((data / "transforms.json").read_text())
        data_dir = data

    fixed = {k: k in meta for k in ("fl_x", "fl_y", "cx", "cy", "h", "w")}
    distort_fixed = any(k in meta for k in ("k1", "k2", "k3", "p1", "p2"))

    downscale = (
        _discover_downscale_factor(meta, data_dir)
        if config.downscale_factor is None
        else int(config.downscale_factor)
    )

    # Sort frames by resolved filename.
    fnames = [
        _get_fname(Path(f["file_path"]), data_dir, downscale) for f in meta["frames"]
    ]
    inds = np.argsort([str(f) for f in fnames])
    frames = [meta["frames"][i] for i in inds]

    image_filenames: list[Path] = []
    thermal_filenames: list[Path] = []
    poses = []
    fx, fy, cx, cy, height, width, distort = [], [], [], [], [], [], []

    for frame in frames:
        fname = _get_fname(Path(frame["file_path"]), data_dir, downscale)
        if not fixed["fl_x"]:
            fx.append(float(frame["fl_x"]))
        if not fixed["fl_y"]:
            fy.append(float(frame["fl_y"]))
        if not fixed["cx"]:
            cx.append(float(frame["cx"]))
        if not fixed["cy"]:
            cy.append(float(frame["cy"]))
        if not fixed["h"]:
            height.append(int(frame["h"]))
        if not fixed["w"]:
            width.append(int(frame["w"]))
        if not distort_fixed:
            distort.append(
                [float(frame.get(k, 0.0)) for k in _DISTORT_KEYS]
            )
        image_filenames.append(fname)
        poses.append(np.array(frame["transform_matrix"], dtype=np.float64))
        if "thermal_file_path" in frame:
            thermal_filenames.append(
                _get_fname(
                    Path(frame["thermal_file_path"]),
                    data_dir,
                    downscale,
                    prefix="thermal_",
                )
            )

    # --- split ---
    has_split_files = any(f"{s}_filenames" in meta for s in ("train", "val", "test"))
    if f"{split}_filenames" in meta:
        split_set = {
            str(_get_fname(Path(x), data_dir, downscale))
            for x in meta[f"{split}_filenames"]
        }
        unmatched = split_set.difference(str(p) for p in image_filenames)
        if unmatched:
            raise RuntimeError(f"Some filenames for split {split} were not found: {unmatched}")
        indices = np.array(
            [i for i, p in enumerate(image_filenames) if str(p) in split_set],
            dtype=np.int32,
        )
    elif has_split_files:
        raise RuntimeError(f"The dataset's list of filenames for split {split} is missing.")
    else:
        if config.eval_mode == "fraction":
            i_train, i_eval = split_fraction(image_filenames, config.train_split_fraction)
        elif config.eval_mode == "filename":
            i_train, i_eval = split_filename(image_filenames)
        elif config.eval_mode == "interval":
            i_train, i_eval = split_interval(image_filenames, config.eval_interval)
        elif config.eval_mode == "all":
            i_train, i_eval = split_all(image_filenames)
        else:
            raise ValueError(f"Unknown eval mode {config.eval_mode}")
        if split == "train":
            indices = i_train
        elif split in ("val", "test", "eval"):
            indices = i_eval
        else:
            raise ValueError(f"Unknown dataparser split {split}")

    orientation_method = meta.get("orientation_override", config.orientation_method)
    poses = np.array(poses, dtype=np.float32)
    poses, transform_matrix = auto_orient_and_center_poses(
        _to_4x4(poses), method=orientation_method, center_method=config.center_method
    )

    scale_factor = 1.0
    if config.auto_scale_poses:
        scale_factor /= float(np.max(np.abs(poses[:, :3, 3])))
    scale_factor *= config.scale_factor
    poses[:, :3, 3] *= scale_factor

    image_filenames = [image_filenames[i] for i in indices]
    thermal_filenames = (
        [thermal_filenames[i] for i in indices] if thermal_filenames else []
    )
    poses = poses[indices]

    aabb = config.scene_scale
    scene_box_aabb = np.array(
        [[-aabb, -aabb, -aabb], [aabb, aabb, aabb]], dtype=np.float32
    )

    def _intrinsic(key, arr, dtype=np.float32):
        if fixed[key]:
            return np.full(len(indices), dtype(meta[key]))
        return np.array(arr, dtype=dtype)[indices]

    out_fx = _intrinsic("fl_x", fx)
    out_fy = _intrinsic("fl_y", fy)
    out_cx = _intrinsic("cx", cx)
    out_cy = _intrinsic("cy", cy)
    out_h = _intrinsic("h", height, dtype=np.int32)
    out_w = _intrinsic("w", width, dtype=np.int32)
    if distort_fixed:
        dist = np.tile(
            np.array([[float(meta.get(k, 0.0)) for k in _DISTORT_KEYS]], np.float32),
            (len(indices), 1),
        )
    else:
        dist = np.array(distort, dtype=np.float32)[indices]

    f = 1.0 / downscale
    cameras = ParsedCameras(
        fx=out_fx * f,
        fy=out_fy * f,
        cx=out_cx * f,
        cy=out_cy * f,
        width=(out_w * f).astype(np.int32),
        height=(out_h * f).astype(np.int32),
        c2w=poses[:, :3, :4].astype(np.float32),
        distortion=dist,
    )

    if "applied_transform" in meta:
        applied = np.array(meta["applied_transform"], dtype=np.float64)
        transform_matrix = transform_matrix @ np.concatenate(
            [applied, np.array([[0, 0, 0, 1.0]])], axis=0
        )
    if "applied_scale" in meta:
        scale_factor *= float(meta["applied_scale"])

    return DataparserOutputs(
        image_filenames=image_filenames,
        thermal_filenames=thermal_filenames,
        cameras=cameras,
        scene_box_aabb=scene_box_aabb,
        dataparser_transform=transform_matrix.astype(np.float32),
        dataparser_scale=float(scale_factor),
    )


def save_dataparser_transforms(outputs: DataparserOutputs, path: Path) -> None:
    """Write the ``dataparser_transforms.json`` sidecar (same schema as
    nerfstudio's, required to replay camera paths against a checkpoint)."""
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(
        json.dumps(
            {
                "transform": outputs.dataparser_transform.tolist(),
                "scale": outputs.dataparser_scale,
            },
            indent=2,
        )
    )
