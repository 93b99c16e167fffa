"""Training losses.

TPU-native replacement for nerfstudio ``model_components/losses.py``
(MSELoss / interlevel_loss / distortion_loss /
scale_gradients_by_distance_squared), bound by the reference at
thermo_nerf/thermal_nerf/thermal_nerf_model.py:277-326.

``interlevel_loss`` is the mipnerf-360 histogram outer-measure bound between
the final nerf weights and each proposal level's weights (evaluated in the
normalized spacing domain). ``distortion_loss`` is the mipnerf-360
regularizer on the final weights. Both use the batched compare-reduce
searchsorted (static shapes, VPU-only).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import Array

from thermo_tpu.ops.math import bracket_above, bracket_below


def mse(pred: Array, gt: Array) -> Array:
    return jnp.mean(jnp.square(pred - gt))


def _outer_measure(t0: Array, t1: Array, y1: Array) -> Array:
    """Sum of y1 mass over t1-bins overlapping each t0 interval (upper bound).

    t0: [R, N0+1] query bin edges; t1: [R, N1+1] histogram bin edges;
    y1: [R, N1] histogram weights. Returns [R, N0].
    """
    cy1 = jnp.concatenate(
        [jnp.zeros_like(y1[..., :1]), jnp.cumsum(y1, axis=-1)], axis=-1
    )  # [R, N1+1]
    # cy1 is nondecreasing (cumsum of nonnegative weights), so the
    # searchsorted + take_along lookups are fused masked max/min reductions
    # (ops/math.bracket_*) — gather-free forward AND scatter-free backward
    # (take_along's VJP would scatter-add into cy1 here, y1 needs grads).
    cy1_lo = bracket_below(t1[..., :-1], t0[..., :-1], cy1[..., :-1])
    cy1_hi = bracket_above(t1[..., 1:], t0[..., 1:], cy1[..., 1:])
    return cy1_hi - cy1_lo


def lossfun_outer(t: Array, w: Array, t_env: Array, w_env: Array) -> Array:
    """clip(w - outer(w_env), 0)^2 / (w + eps), elementwise over final bins."""
    eps = jnp.finfo(jnp.float32).eps
    w_outer = _outer_measure(t, t_env, w_env)
    return jnp.square(jnp.clip(w - w_outer, 0.0, None)) / (w + eps)


def interlevel_loss(
    final_sbins: Array,
    final_weights: Array,
    prop_sbins: Sequence[Array],
    prop_weights: Sequence[Array],
) -> Array:
    """nerfstudio interlevel_loss: final histogram (detached) bounded by each
    proposal histogram; mean over rays/bins, summed over proposal levels.

    ``final_sbins``: [R, S+1] spacing-domain bin edges of the final samples;
    ``final_weights``: [R, S, 1]; prop_*: per proposal level.
    """
    c = jax.lax.stop_gradient(final_sbins)
    w = jax.lax.stop_gradient(final_weights[..., 0])
    total = 0.0
    for cp, wp in zip(prop_sbins, prop_weights):
        total = total + jnp.mean(lossfun_outer(c, w, cp, wp[..., 0]))
    return total


def lossfun_distortion(t: Array, w: Array) -> Array:
    """mipnerf-360 distortion on one histogram: t [R, S+1], w [R, S] -> [R]."""
    ut = (t[..., 1:] + t[..., :-1]) / 2.0
    dut = jnp.abs(ut[..., :, None] - ut[..., None, :])
    loss_inter = jnp.sum(w * jnp.sum(w[..., None, :] * dut, axis=-1), axis=-1)
    loss_intra = jnp.sum(jnp.square(w) * (t[..., 1:] - t[..., :-1]), axis=-1) / 3.0
    return loss_inter + loss_intra


def distortion_loss(final_sbins: Array, final_weights: Array) -> Array:
    """nerfstudio distortion_loss: applied to the FINAL level only."""
    return jnp.mean(lossfun_distortion(final_sbins, final_weights[..., 0]))


def scale_gradients_by_distance_squared(values: Array, tmids: Array) -> Array:
    """Radiance-field gradient scaling (Philip & Deschaintre 2023), optional in
    nerfacto (``use_gradient_scaling``): forward identity, backward scaled by
    clip(mid^2, 0, 1). ``tmids``: [R, S, 1] euclidean midpoints."""
    scale = jnp.clip(jnp.square(tmids), 0.0, 1.0)
    return values * scale + jax.lax.stop_gradient(values * (1.0 - scale))
