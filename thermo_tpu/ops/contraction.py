"""Spatial distortions.

TPU-native equivalent of nerfstudio ``field_components/spatial_distortions.py``
``SceneContraction(order=inf)`` (bound by the reference at
thermo_nerf/thermal_nerf/thermal_nerf_model.py:91-94): the mipnerf-360
unbounded-scene contraction, L-infinity variant, mapping R^3 into the
radius-2 ball.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def scene_contraction_inf(x: Array) -> Array:
    """L-inf scene contraction: identity inside the unit ball (inf-norm),
    ``(2 - 1/||x||) * x/||x||`` outside. Output lies in [-2, 2]^3."""
    mag = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    mag = jnp.maximum(mag, 1e-12)
    contracted = (2.0 - 1.0 / mag) * (x / mag)
    return jnp.where(mag <= 1.0, x, contracted)


def scene_contraction_l2(x: Array) -> Array:
    """L2 scene contraction (mipnerf-360 eq. 10); provided for completeness."""
    mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
    mag = jnp.maximum(mag, 1e-12)
    contracted = (2.0 - 1.0 / mag) * (x / mag)
    return jnp.where(mag <= 1.0, x, contracted)


def contract_to_unit_cube(x: Array) -> Array:
    """SceneContraction(inf) followed by the nerfstudio ``(x + 2) / 4``
    remap into [0, 1]^3 used before hash-grid lookup
    (nerfstudio fields/nerfacto_field.py get_density)."""
    return (scene_contraction_inf(x) + 2.0) / 4.0


def normalize_with_aabb(x: Array, aabb: Array) -> Array:
    """SceneBox.get_normalized_positions: map aabb -> [0,1]^3.

    ``aabb``: [2, 3] (min corner, max corner)."""
    return (x - aabb[0]) / (aabb[1] - aabb[0])
