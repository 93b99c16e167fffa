"""Cameras and ray generation.

TPU-native equivalent of nerfstudio ``cameras/cameras.py`` (pinhole +
radial/tangential distortion ray generation, OpenGL convention) and
``cameras/camera_utils.py`` (iterative undistortion), bound by the reference
at thermal_dataparser.py:300-310 and evaluator.py:68-76.

The camera table is a small pytree of device arrays; ray generation is a pure
jittable function so the training step can generate rays ON DEVICE from
sampled pixel indices — no host ray buffers, no host<->device traffic in the
steady-state train loop (a deliberate departure from nerfstudio's host-side
RayBundle construction).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from thermo_tpu.ops.math import normalize


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Cameras:
    """Batched pinhole cameras. All fields are [N] / [N, ...] arrays."""

    fx: Array
    fy: Array
    cx: Array
    cy: Array
    width: Array  # int32 [N]
    height: Array  # int32 [N]
    c2w: Array  # [N, 3, 4]
    distortion: Array  # [N, 6] (k1 k2 k3 k4 p1 p2)

    def tree_flatten(self):
        return (
            (self.fx, self.fy, self.cx, self.cy, self.width, self.height,
             self.c2w, self.distortion),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def __len__(self):
        return self.fx.shape[0]

    @classmethod
    def from_numpy(cls, fx, fy, cx, cy, width, height, c2w, distortion=None):
        n = len(np.atleast_1d(fx))
        if distortion is None:
            distortion = np.zeros((n, 6), np.float32)
        return cls(
            fx=jnp.asarray(fx, jnp.float32).reshape(n),
            fy=jnp.asarray(fy, jnp.float32).reshape(n),
            cx=jnp.asarray(cx, jnp.float32).reshape(n),
            cy=jnp.asarray(cy, jnp.float32).reshape(n),
            width=jnp.asarray(width, jnp.int32).reshape(n),
            height=jnp.asarray(height, jnp.int32).reshape(n),
            c2w=jnp.asarray(c2w, jnp.float32).reshape(n, 3, 4),
            distortion=jnp.asarray(distortion, jnp.float32).reshape(n, 6),
        )

    def scaled(self, factor: float) -> "Cameras":
        """rescale_output_resolution: scale intrinsics by ``factor``."""
        return Cameras(
            fx=self.fx * factor,
            fy=self.fy * factor,
            cx=self.cx * factor,
            cy=self.cy * factor,
            width=(self.width.astype(jnp.float32) * factor).astype(jnp.int32),
            height=(self.height.astype(jnp.float32) * factor).astype(jnp.int32),
            c2w=self.c2w,
            distortion=self.distortion,
        )


class RayBundle(NamedTuple):
    origins: Array  # [R, 3]
    directions: Array  # [R, 3] unit-norm
    camera_indices: Array  # [R] int32


def _undistort(
    xd: Array, yd: Array, dist: Array, eps: float = 1e-3, iters: int = 10
) -> tuple[Array, Array]:
    """Newton-iterate the inverse of the OpenCV radial/tangential distortion
    model (nerfstudio camera_utils.radial_and_tangential_undistort).

    ``dist``: [..., 6] = (k1, k2, k3, k4, p1, p2). Static 10-iteration loop.
    """
    k1, k2, k3, k4 = dist[..., 0], dist[..., 1], dist[..., 2], dist[..., 3]
    p1, p2 = dist[..., 4], dist[..., 5]
    x, y = xd, yd
    for _ in range(iters):
        r = x * x + y * y
        d = 1.0 + r * (k1 + r * (k2 + r * (k3 + r * k4)))
        fx = d * x + 2.0 * p1 * x * y + p2 * (r + 2.0 * x * x) - xd
        fy = d * y + 2.0 * p2 * x * y + p1 * (r + 2.0 * y * y) - yd
        d_r = k1 + r * (2.0 * k2 + r * (3.0 * k3 + r * 4.0 * k4))
        d_x = 2.0 * x * d_r
        d_y = 2.0 * y * d_r
        fx_x = d + d_x * x + 2.0 * p1 * y + 6.0 * p2 * x
        fx_y = d_y * x + 2.0 * p1 * x + 2.0 * p2 * y
        fy_x = d_x * y + 2.0 * p2 * y + 2.0 * p1 * x
        fy_y = d + d_y * y + 2.0 * p2 * x + 6.0 * p1 * y
        den = fy_x * fx_y - fx_x * fy_y
        x_num = fx * fy_y - fy * fx_y
        y_num = fy * fx_x - fx * fy_x
        step_x = jnp.where(jnp.abs(den) > eps, x_num / den, jnp.zeros_like(den))
        step_y = jnp.where(jnp.abs(den) > eps, y_num / den, jnp.zeros_like(den))
        x = x + jnp.clip(step_x, -0.5, 0.5)
        y = y + jnp.clip(step_y, -0.5, 0.5)
    return x, y


def generate_rays(
    cameras: Cameras,
    camera_indices: Array,
    pixel_y: Array,
    pixel_x: Array,
    pose_deltas: Optional[Array] = None,
) -> RayBundle:
    """Generate world-space rays through pixel centers.

    ``camera_indices``: [R] int32; ``pixel_y``/``pixel_x``: [R] pixel indices
    (integer row/col; the +0.5 center offset is added here, matching
    nerfstudio ``get_image_coords(pixel_offset=0.5)``).
    ``pose_deltas``: optional [R, 3, 4] camera-optimizer corrections
    ([R|t], applied as origins += t; directions = R @ directions —
    nerfstudio CameraOptimizer.apply_to_raybundle).
    """
    idx = camera_indices
    fx = cameras.fx[idx]
    fy = cameras.fy[idx]
    cx = cameras.cx[idx]
    cy = cameras.cy[idx]
    c2w = cameras.c2w[idx]  # [R, 3, 4]
    dist = cameras.distortion[idx]

    x = pixel_x.astype(jnp.float32) + 0.5
    y = pixel_y.astype(jnp.float32) + 0.5
    coord_x = (x - cx) / fx
    coord_y = -(y - cy) / fy

    coord_x, coord_y = _undistort(coord_x, coord_y, dist)

    dir_cam = jnp.stack([coord_x, coord_y, -jnp.ones_like(coord_x)], axis=-1)
    dir_world = jnp.einsum("rij,rj->ri", c2w[..., :3, :3], dir_cam)
    origins = c2w[..., :3, 3]
    directions = normalize(dir_world)

    if pose_deltas is not None:
        origins = origins + pose_deltas[..., :3, 3]
        directions = jnp.einsum("rij,rj->ri", pose_deltas[..., :3, :3], directions)

    return RayBundle(
        origins=origins, directions=directions, camera_indices=idx.astype(jnp.int32)
    )


def pixel_grid(height: int, width: int) -> tuple[np.ndarray, np.ndarray]:
    """Full-image pixel index grid (row-major), as int32 [H*W] arrays."""
    yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    return yy.reshape(-1).astype(np.int32), xx.reshape(-1).astype(np.int32)
