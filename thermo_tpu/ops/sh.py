"""Spherical-harmonics direction encoding.

TPU-native equivalent of the tiny-cuda-nn ``SphericalHarmonics`` encoding used
by nerfstudio's NerfactoField direction encoding (degree 4 -> 16 components;
reference binding: nerfstudio fields/nerfacto_field.py ``SHEncoding(levels=4)``,
consumed by thermo_nerf thermal_field.py get_outputs via
``self.direction_encoding``).

Real SH basis evaluated on unit direction vectors, hardcoded polynomial form
(identical constants to tiny-cuda-nn / instant-ngp). Pure elementwise math:
XLA fuses this into the surrounding MLP input concat on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def sh_encoding(directions: Array, levels: int = 4) -> Array:
    """Evaluate real SH basis functions of degree < ``levels``.

    ``directions``: [..., 3] unit vectors. Returns [..., levels**2].
    """
    if not 1 <= levels <= 4:
        raise ValueError(f"SH encoding supports 1..4 levels, got {levels}")

    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z

    components = [jnp.full_like(x, 0.28209479177387814)]  # l=0
    if levels > 1:  # l=1
        components += [
            0.4886025119029199 * y,
            0.4886025119029199 * z,
            0.4886025119029199 * x,
        ]
    if levels > 2:  # l=2
        components += [
            1.0925484305920792 * xy,
            1.0925484305920792 * yz,
            0.9461746957575601 * zz - 0.31539156525252005,
            1.0925484305920792 * xz,
            0.5462742152960396 * (xx - yy),
        ]
    if levels > 3:  # l=3
        components += [
            0.5900435899266435 * y * (3.0 * xx - yy),
            2.890611442640554 * xy * z,
            0.4570457994644658 * y * (5.0 * zz - 1.0),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.4570457994644658 * x * (5.0 * zz - 1.0),
            1.445305721320277 * z * (xx - yy),
            0.5900435899266435 * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(components, axis=-1)


def sh_dim(levels: int) -> int:
    return levels * levels
