"""Sort-based scatter-free backward for the hash-grid encoding.

XLA's TPU scatter-add lowering costs ~60ns per update (measured v5e) and its
compile time for 10M+-element scatters is pathological through AOT
toolchains, making the hash-table gradient the dominant cost of a ThermoNeRF
train step (SURVEY §7 "hard parts"). This module reformulates scatter-add as

    sort_key_val -> gather -> cumsum -> segment boundaries -> one
    masked unique-index store,

i.e. entirely in primitives the TPU executes well (bitonic sort, sequential
cumsum, row gathers). Segment sums are recovered with a cummax
forward-fill of segment starts — no searchsorted over the table, no
scatter-add anywhere.

``segment_sum_sorted_free`` is exact (duplicate "overflow" writes all target
a dropped guard row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def scatter_add_via_sort(indices: Array, values: Array, num_rows: int) -> Array:
    """Equivalent of ``zeros((num_rows, F)).at[indices].add(values)``.

    ``indices``: int32 [M]; ``values``: [M, F]. Returns [num_rows, F].
    """
    m = indices.shape[0]
    si, order = jax.lax.sort_key_val(indices, jnp.arange(m, dtype=jnp.int32))
    sv = jnp.take(values, order, axis=0)
    cs = jnp.cumsum(sv, axis=0)

    is_first = jnp.concatenate([jnp.array([True]), si[1:] != si[:-1]])
    is_last = jnp.concatenate([si[:-1] != si[1:], jnp.array([True])])

    # cumulative sum up to (exclusive) each segment's first element,
    # forward-filled to every element of the segment via a cummax on indices
    cs_excl = cs - sv
    pos_first = jax.lax.cummax(
        jnp.where(is_first, jnp.arange(m, dtype=jnp.int32), -1)
    )
    seg_start = jnp.take(cs_excl, pos_first, axis=0)
    rowtotal = cs - seg_start  # the segment total, valid at is_last positions

    # one store per table row; non-last positions are dumped into a guard row
    tgt = jnp.where(is_last, si, num_rows)
    out = jnp.zeros((num_rows + 1, values.shape[-1]), values.dtype)
    out = out.at[tgt].set(rowtotal, mode="drop")
    return out[:num_rows]
