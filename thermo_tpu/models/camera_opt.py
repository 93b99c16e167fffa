"""Learned per-camera pose refinement.

TPU-native equivalent of nerfstudio ``cameras/camera_optimizers.py``
(CameraOptimizer, modes off / SO3xR3 / SE3) and ``cameras/lie_groups.py``
(pytorch3d-style exponential maps), bound by the reference at
thermal_nerfacto.py:24-25 / thermal_nerf_model.py:218-219 / evaluator.py:71-76.

The optimizer state is a single [num_cameras, 6] tangent-space parameter
(translation xyz + rotation log xyz), zero-initialized, living in its own
optimizer group ("camera_opt").
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def init_pose_adjustment(num_cameras: int) -> Array:
    return jnp.zeros((num_cameras, 6), jnp.float32)


def _hat(v: Array) -> Array:
    """Skew-symmetric matrix of v [..., 3] -> [..., 3, 3]."""
    zeros = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def exp_map_SO3xR3(tangent: Array) -> Array:
    """[..., 6] -> [..., 3, 4]: R = exp(hat(tangent[3:6])), t = tangent[0:3].

    Taylor-guarded Rodrigues formula (matches pytorch3d/nerfstudio
    exp_map_SO3xR3 to fp32 precision)."""
    log_rot = tangent[..., 3:]
    t = tangent[..., :3]
    nrms = jnp.sum(jnp.square(log_rot), axis=-1)
    theta = jnp.sqrt(jnp.clip(nrms, 1e-8, None))
    theta_safe = jnp.maximum(theta, 1e-8)
    fac1 = jnp.sin(theta_safe) / theta_safe
    fac2 = (1.0 - jnp.cos(theta_safe)) / jnp.square(theta_safe)
    skews = _hat(log_rot)
    skews_sq = skews @ skews
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tangent.dtype), skews.shape)
    rot = eye + fac1[..., None, None] * skews + fac2[..., None, None] * skews_sq
    return jnp.concatenate([rot, t[..., None]], axis=-1)


def exp_map_SE3(tangent: Array) -> Array:
    """[..., 6] -> [..., 3, 4] full SE(3) exponential map."""
    log_rot = tangent[..., 3:]
    v = tangent[..., :3]
    nrms = jnp.sum(jnp.square(log_rot), axis=-1)
    theta = jnp.sqrt(jnp.clip(nrms, 1e-8, None))
    theta_safe = jnp.maximum(theta, 1e-8)
    fac1 = jnp.sin(theta_safe) / theta_safe
    fac2 = (1.0 - jnp.cos(theta_safe)) / jnp.square(theta_safe)
    fac3 = (theta_safe - jnp.sin(theta_safe)) / (theta_safe**3)
    skews = _hat(log_rot)
    skews_sq = skews @ skews
    eye = jnp.broadcast_to(jnp.eye(3, dtype=tangent.dtype), skews.shape)
    rot = eye + fac1[..., None, None] * skews + fac2[..., None, None] * skews_sq
    V = eye + fac2[..., None, None] * skews + fac3[..., None, None] * skews_sq
    t = jnp.einsum("...ij,...j->...i", V, v)
    return jnp.concatenate([rot, t[..., None]], axis=-1)


def camera_deltas(
    pose_adjustment: Array, camera_indices: Array, mode: str = "SO3xR3"
) -> Array | None:
    """Per-ray [R, 3, 4] correction matrices, or None for mode='off'."""
    if mode == "off":
        return None
    tangent = pose_adjustment[camera_indices]
    if mode == "SO3xR3":
        return exp_map_SO3xR3(tangent)
    if mode == "SE3":
        return exp_map_SE3(tangent)
    raise ValueError(f"unknown camera optimizer mode {mode!r}")


def _safe_norm(x: Array, axis: int = -1) -> Array:
    """||x|| with subgradient 0 at x=0 (torch semantics; jnp.linalg.norm
    produces NaN gradients at exactly zero, which is where the pose
    adjustment starts)."""
    sq = jnp.sum(jnp.square(x), axis=axis)
    safe = jnp.where(sq > 0, sq, 1.0)
    return jnp.where(sq > 0, jnp.sqrt(safe), 0.0)


def camera_opt_regularizer(
    pose_adjustment: Array,
    trans_l2_penalty: float = 1e-2,
    rot_l2_penalty: float = 1e-3,
) -> Array:
    """nerfstudio CameraOptimizer.get_loss_dict regularizer (added only by the
    concat model in the reference, concat_nerfacto_model.py:232)."""
    trans = _safe_norm(pose_adjustment[..., :3]).mean()
    rot = _safe_norm(pose_adjustment[..., 3:]).mean()
    return trans * trans_l2_penalty + rot * rot_l2_penalty


def camera_opt_metrics(pose_adjustment: Array) -> dict[str, Array]:
    """nerfstudio CameraOptimizer.get_metrics_dict."""
    return {
        "camera_opt_translation": _safe_norm(pose_adjustment[..., :3]).mean(),
        "camera_opt_rotation": _safe_norm(pose_adjustment[..., 3:]).mean(),
    }
