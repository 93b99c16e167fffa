"""Numerical primitives shared across the compute stack.

TPU-native replacements for small torch/nerfstudio helpers:
  * ``trunc_exp``       — nerfstudio ``field_components/activations.py`` (exp with
                          gradient computed at the input clamped to [-15, 15]).
  * ``searchsorted``    — batched sorted-array lookup. torch.searchsorted supports
                          batched "innermost dim" semantics; jnp.searchsorted does
                          not, so we implement it with a fully-vectorized
                          comparison-reduction that maps onto the TPU VPU
                          (no sort, no scatter, static shapes).
  * ``normalize``       — safe unit-normalization.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x: jax.Array) -> jax.Array:
    """exp(x) whose gradient is exp(clamp(x, -15, 15)).

    Mirrors nerfstudio's ``trunc_exp`` used for density activation
    (reference binding: nerfstudio fields/nerfacto_field.py get_density).
    """
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


def searchsorted(a: jax.Array, v: jax.Array, side: str = "left") -> jax.Array:
    """Batched searchsorted over the last axis.

    ``a``: [..., N] sorted along the last axis.
    ``v``: [..., M] query values (leading axes broadcast against ``a``).

    Returns int32 [..., M] insertion indices in [0, N], matching
    ``torch.searchsorted(a, v, right=(side=='right'))`` semantics.

    Implemented as a broadcast compare + sum-reduce: O(N*M) elementwise work,
    fully fused by XLA into a single VPU reduction with no materialized
    [..., M, N] intermediate for typical nerf sizes (N, M <= a few hundred).
    """
    if side not in ("left", "right"):
        raise ValueError(f"side must be 'left' or 'right', got {side}")
    if side == "left":
        cmp = a[..., None, :] < v[..., :, None]
    else:
        cmp = a[..., None, :] <= v[..., :, None]
    return jnp.sum(cmp.astype(jnp.int32), axis=-1)


def bracket_below(
    keys: jax.Array, v: jax.Array, vals: jax.Array, side: str = "right"
) -> jax.Array:
    """Gather-free ``vals[clip(searchsorted(keys, v, side) - 1, 0, N-1)]``.

    ``keys``: [..., N] sorted; ``v``: [..., M] queries; ``vals``: [..., N]
    NONDECREASING along the last axis (cdf / bin edges / cumsums — every hot
    lookup in this codebase). Returns [..., M].

    Rationale: take_along_axis lowers to per-element XLA gathers (~5-9 ns
    each on v5e) and its BACKWARD is a scatter-add; at sampler/loss shapes
    that is millions of gathers+scatters per train step. Because ``vals`` is
    monotone, the value at the last key <= v equals a masked max — a fused
    compare+reduce on the VPU with a dense (scatter-free) backward. The
    [..., M, N] mask is fused into the reduction, never materialized.
    """
    if side == "right":
        m = keys[..., None, :] <= v[..., :, None]
    else:
        m = keys[..., None, :] < v[..., :, None]
    guarded = jnp.where(m, vals[..., None, :], vals[..., None, :1])
    return jnp.max(guarded, axis=-1)


def bracket_above(
    keys: jax.Array, v: jax.Array, vals: jax.Array, side: str = "right"
) -> jax.Array:
    """Gather-free ``vals[clip(searchsorted(keys, v, side), 0, N-1)]``
    (see bracket_below; ``vals`` must be nondecreasing)."""
    if side == "right":
        m = keys[..., None, :] <= v[..., :, None]
    else:
        m = keys[..., None, :] < v[..., :, None]
    guarded = jnp.where(m, vals[..., None, -1:], vals[..., None, :])
    return jnp.min(guarded, axis=-1)


def take_along_last(a: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather along the last axis: a[..., idx] with batched indices.

    Equivalent to torch.gather(a, -1, idx) / torch.take_along_dim(a, idx, -1).
    """
    return jnp.take_along_axis(a, idx, axis=-1)


def normalize(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Unit-normalize along the last axis."""
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def expected_sin(x_means: jax.Array, x_vars: jax.Array) -> jax.Array:
    """E[sin(x)] for x ~ N(means, vars) (used by integrated encodings)."""
    return jnp.exp(-0.5 * x_vars) * jnp.sin(x_means)
