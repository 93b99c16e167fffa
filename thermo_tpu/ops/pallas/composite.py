"""Fused ray-march + alpha-composite Pallas kernel.

Emits RGB, thermal, accumulation, median depth and expected depth in ONE
pass over the samples of a ray block (the reference needs five separate
renderer invocations; nerfacc fuses on GPU — this is the TPU equivalent).
Dense [rays, samples] layout: rays ride the 8-sublane axis, samples the
128-lane axis (S <= 128 for nerfacto's 48 final samples), so the cumulative
ops vectorize along lanes.

NOT wired into the model: this kernel was measured 8.6x SLOWER than XLA's
automatic fusion of the plain-XLA path in ``thermo_tpu.ops.rendering``
(PERFORMANCE.md "Alternatives measured (and rejected)"), so the model always
uses the XLA path. The kernel is kept, with its parity test, as the measured
receipt for that rejection; it is forward-only (no autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_R = 256


def _cumsum_lanes(x: Array, size: int) -> Array:
    """Inclusive prefix sum along the lane (last) axis via Hillis-Steele
    log-doubling (Mosaic has no cumsum primitive): log2(S) roll+mask+add
    steps on the VPU."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < size:
        shifted = jnp.where(col >= k, pltpu.roll(x, k, axis=1), 0.0)
        x = x + shifted
        k *= 2
    return x


def _composite_kernel(
    density_ref, starts_ref, ends_ref, rgb_r_ref, rgb_g_ref, rgb_b_ref,
    thermal_ref,
    rgb_out_ref, thermal_out_ref, acc_ref, depth_ref, exp_depth_ref,
):
    density = density_ref[:]  # [BR, S]
    starts = starts_ref[:]
    ends = ends_ref[:]
    deltas = ends - starts
    dd = deltas * density
    s_count = dd.shape[-1]
    alphas = 1.0 - jnp.exp(-dd)
    accum_dd = _cumsum_lanes(dd, s_count) - dd  # exclusive
    trans = jnp.exp(-accum_dd)
    w = alphas * trans  # [BR, S]

    acc = jnp.sum(w, axis=-1, keepdims=True)  # [BR, 1]
    acc_ref[:] = acc

    last = w[:, -1:] * 0.0  # placeholder to keep shapes obvious
    del last

    thermal = thermal_ref[:]
    comp_t = jnp.sum(w * thermal, axis=-1, keepdims=True)
    # background = last sample (thermal renderer quirk, thermal_renderer.py:49)
    thermal_out_ref[:] = comp_t + thermal[:, -1:] * (1.0 - acc)

    for c, ref in enumerate((rgb_r_ref, rgb_g_ref, rgb_b_ref)):
        ch = ref[:]
        comp = jnp.sum(w * ch, axis=-1, keepdims=True)
        rgb_out_ref[:, c : c + 1] = comp + ch[:, -1:] * (1.0 - acc)

    steps = (starts + ends) / 2.0
    eps = 1e-10
    exp_depth_ref[:] = jnp.sum(w * steps, axis=-1, keepdims=True) / (acc + eps)

    # median depth: first sample where the weight CDF crosses 0.5
    # (selected by one-hot mask — Mosaic's gather can't do per-row indices)
    cum = _cumsum_lanes(w, s_count)
    idx = jnp.sum((cum < 0.5).astype(jnp.int32), axis=-1, keepdims=True)
    idx = jnp.minimum(idx, steps.shape[-1] - 1)
    col = jax.lax.broadcasted_iota(jnp.int32, steps.shape, 1)
    depth_ref[:] = jnp.sum(
        jnp.where(col == idx, steps, 0.0), axis=-1, keepdims=True
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_composite(
    density: Array,
    starts: Array,
    ends: Array,
    rgb: Array,
    thermal: Array,
    interpret: bool = False,
) -> dict[str, Array]:
    """density/starts/ends [R, S, 1]; rgb [R, S, 3]; thermal [R, S, 1].

    Returns {"rgb" [R,3] (last-sample bg), "thermal" [R,1] (last-sample bg),
    "accumulation" [R,1], "depth" [R,1], "expected_depth" [R,1]}.
    """
    R, S = density.shape[0], density.shape[1]
    grid = (pl.cdiv(R, _BLOCK_R),)
    row_spec = pl.BlockSpec((_BLOCK_R, S), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((_BLOCK_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    rgb3_spec = pl.BlockSpec((_BLOCK_R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM)

    outs = pl.pallas_call(
        _composite_kernel,
        grid=grid,
        in_specs=[row_spec] * 7,
        out_specs=(rgb3_spec, out_spec, out_spec, out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((R, 3), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
        ),
        interpret=interpret,
    )(
        density[..., 0], starts[..., 0], ends[..., 0],
        rgb[..., 0], rgb[..., 1], rgb[..., 2], thermal[..., 0],
    )
    rgb_out, thermal_out, acc, depth, exp_depth = outs
    return {
        "rgb": rgb_out,
        "thermal": thermal_out,
        "accumulation": acc,
        "depth": depth,
        "expected_depth": exp_depth,
    }
