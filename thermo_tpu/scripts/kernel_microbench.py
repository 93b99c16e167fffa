"""Microbenchmarks for the hash-table memory primitives that dominate the
train step (PERFORMANCE.md: >90% of step time is hash gather/scatter).

Each case is shaped like the real workload: the final field does
``N = 196608 samples x 8 corners = 1.57M`` lookups per level into a
``T = 2^19`` table with ``F = 2`` features, 16 levels; the two proposal
fields add 1.05M/0.39M samples x 5 levels.

Run: ``python -m thermo_tpu.scripts.kernel_microbench [--quick]``
Prints one line per case: name, total ms, ns per element.

Timing protocol for tunneled TPUs: ops are repeated inside one jit with a
data dependency chaining iterations, and the clock stops on a host fetch of
a scalar (block_until_ready does not synchronize through the tunnel).
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x) -> float:
    return float(jnp.ravel(x)[0])


def timed(fn, *args, reps: int = 4) -> float:
    """Median wall-clock seconds of fn(*args), host-fetch synchronized."""
    out = fn(*args)  # compile + warm
    _sync(out if not isinstance(out, tuple) else out[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out if not isinstance(out, tuple) else out[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def chain(op, n_iter: int):
    """Repeat op inside one jit; op(carry, x) -> carry must depend on x."""

    @jax.jit
    def run(x0, *rest):
        def body(i, carry):
            return op(carry, *rest)

        return jax.lax.fori_loop(0, n_iter, body, x0)

    return run


def field_level(reps: int = 3) -> None:
    """Field-level costs at exact model shapes (hash_encode / field.apply),
    complementing the primitive cases below. These run the real modules, so
    they include geometry, gathers, trilinear blend and MLPs."""
    import jax
    import jax.numpy as jnp

    from thermo_tpu.ops.hash_encoding import (
        HashGridSpec,
        hash_encode,
        init_hash_table,
    )

    key = jax.random.PRNGKey(0)
    spec = HashGridSpec()
    table = init_hash_table(key, spec)
    p_final = jax.random.uniform(key, (196608, 3))
    p_prop = jax.random.uniform(key, (1048576, 3))
    spec_prop = HashGridSpec(num_levels=5, log2_hashmap_size=17, max_res=128)
    table_prop = init_hash_table(key, spec_prop)

    cases = {
        "hash_encode final (196K pts, 16 lv)": (
            lambda t, p: jnp.sum(hash_encode(t, p, spec)[:2]), table, p_final),
        "hash_encode prop exact (1.05M pts, 5 lv)": (
            lambda t, p: jnp.sum(hash_encode(t, p, spec_prop)[:2]),
            table_prop, p_prop),
        "hash_encode prop fwd2 (1.05M pts, 5 lv)": (
            lambda t, p: jnp.sum(hash_encode(t, p, spec_prop, fwd_corners=2)[:2]),
            table_prop, p_prop),
        "hash_encode final bwd gc2 (196K pts)": (
            jax.grad(lambda t, p: jnp.sum(
                hash_encode(t, p, spec, grad_corners=2)[:2]).astype(jnp.float32)),
            table, p_final),
    }
    for name, (f, t, p) in cases.items():
        fn = jax.jit(f)
        out = fn(t, p)
        _sync(out if not isinstance(out, tuple) else out[0])
        import time as _time

        ts = []
        for _ in range(reps):
            t0 = _time.perf_counter()
            out = fn(t, p)
            _sync(out if not isinstance(out, tuple) else out[0])
            ts.append(_time.perf_counter() - t0)
        print(f"{name:48s} {float(np.median(ts))*1e3:8.1f} ms", flush=True)


def width_scaling(quick: bool = False) -> None:
    """Design-decision cases for the low-rank / packed-gather redesign:

    a. gather per-INDEX cost vs row width F (is the hardware index-bound or
       byte-bound?) — decides whether wide-feature representations
       (triplane/VM, F=16..32 rows) beat the hash grid's 2-wide rows.
    b. packed bf16 pairs in int32: one scalar gather fetching 2 features.
    c. two-hot interpolation matmul: N samples x line table [R, K] evaluated
       as onehot(floor)*(1-f) + onehot(floor+1)*f contracted on the MXU —
       the gather AND its backward become matmuls (no scatters at all).
       This is the candidate TPU-native encoding for proposal density fields.
    """
    N = 1 << 17 if quick else 1 << 20
    reps = 2 if quick else 4
    n_iter = 2 if quick else 4
    key = jax.random.PRNGKey(0)
    kt, ki, kg = jax.random.split(key, 3)

    def depend(c):
        return jnp.int32(jnp.abs(c) > 1e30)

    def report(name, secs, elements):
        per = secs / n_iter
        print(
            f"{name:58s} {per * 1e3:9.2f} ms  {per / elements * 1e9:8.2f} ns/el",
            flush=True,
        )

    # ---- a. gather cost vs row width (pre-transposed [F, T] take axis=1) ----
    T = 1 << 19
    idx = jax.random.randint(ki, (N,), 0, T, jnp.int32)
    for F in (1, 2, 4, 8, 16, 32):
        table = jax.random.normal(kt, (F, T), jnp.float32)

        def op(carry, tbl, fi):
            g = jnp.take(tbl, fi + depend(carry), axis=1)  # [F, N]
            return carry + jnp.sum(g[:, :8].astype(jnp.float32))

        run = chain(op, n_iter)
        secs = timed(run, jnp.zeros(()), table, idx, reps=reps)
        report(f"gather [F={F} f32] pre-T ({N} idx)", secs, N)

    # row-major [T, F] row gather (output [N, F], F minor)
    for F in (8, 32):
        table = jax.random.normal(kt, (T, F), jnp.float32)

        def op(carry, tbl, fi):
            g = jnp.take(tbl, fi + depend(carry), axis=0)  # [N, F]
            return carry + jnp.sum(g[:8].astype(jnp.float32))

        run = chain(op, n_iter)
        secs = timed(run, jnp.zeros(()), table, idx, reps=reps)
        report(f"gather row-major [T,F={F}] ({N} idx)", secs, N)

    # bf16 rows: does halving bytes/row extend the flat-cost region?
    for F in (8, 16, 32):
        table = jax.random.normal(kt, (F, T), jnp.bfloat16)

        def op(carry, tbl, fi):
            g = jnp.take(tbl, fi + depend(carry), axis=1)  # [F, N]
            return carry + jnp.sum(g[:, :8].astype(jnp.float32))

        run = chain(op, n_iter)
        secs = timed(run, jnp.zeros(()), table, idx, reps=reps)
        report(f"gather [F={F} bf16] pre-T ({N} idx)", secs, N)

    # row scatter widths, fixed protocol (old table used a stale protocol)
    for F, dt in ((2, jnp.float32), (4, jnp.float32), (8, jnp.float32),
                  (8, jnp.bfloat16), (16, jnp.float32)):
        vals = jax.random.normal(kg, (N, F), dt)

        def op_row(carry, si, v):
            d = jnp.zeros((T, F), dt).at[si + depend(carry)].add(v)
            return carry + jnp.sum(d[:8, :]).astype(jnp.float32)

        run = chain(op_row, n_iter)
        secs = timed(run, jnp.zeros(()), idx, vals, reps=reps)
        report(f"scatter row [F={F} {dt.__name__}] ({N} rows)", secs, N)

    # scalar scatter baseline under the same protocol
    vals = jax.random.normal(kg, (N,), jnp.float32)

    def op_sc(carry, si, v):
        d = jnp.zeros((T,), jnp.float32).at[si + depend(carry)].add(v)
        return carry + jnp.sum(d[:8])

    run = chain(op_sc, n_iter)
    secs = timed(run, jnp.zeros(()), idx, vals, reps=reps)
    report(f"scatter scalar ({N} updates)", secs, N)

    # ---- b. packed bf16 pair in int32: one scalar gather = 2 features ----
    packed = jax.random.randint(kt, (T,), 0, 2**31 - 1, jnp.int32)

    def op_packed(carry, tbl, fi):
        g = jnp.take(tbl, fi + depend(carry))  # [N] int32
        both = jax.lax.bitcast_convert_type(g, jnp.bfloat16)  # [N, 2]
        return carry + jnp.sum(both[:8].astype(jnp.float32))

    run = chain(op_packed, n_iter)
    secs = timed(run, jnp.zeros(()), packed, idx, reps=reps)
    report(f"gather packed-int32 (2xbf16/idx) ({N} idx)", secs, N)

    # ---- c. two-hot interpolation matmul over line tables ----
    for R, K in ((256, 32), (2048, 32)):
        lines = jax.random.normal(kt, (R, K), jnp.bfloat16)
        x = jax.random.uniform(ki, (N,), jnp.float32, 0.0, float(R - 1))
        CH = 1 << 15

        def op_twohot(carry, ln, xs):
            def body(c, x_c):
                x_c = x_c + jnp.float32(depend(c))
                f0 = jnp.floor(x_c)
                fr = (x_c - f0)[:, None]
                i0 = f0.astype(jnp.int32)[:, None]
                ar = jnp.arange(R, dtype=jnp.int32)[None]
                w = ((ar == i0) * (1.0 - fr) + (ar == i0 + 1) * fr).astype(
                    jnp.bfloat16
                )  # [CH, R] two-hot
                feats = jnp.dot(w, ln, preferred_element_type=jnp.float32)
                return c + jnp.sum(feats[:8]), 0.0

            c, _ = jax.lax.scan(body, carry, xs.reshape(-1, CH))
            return c

        run = chain(op_twohot, n_iter)
        secs = timed(run, jnp.zeros(()), lines, x, reps=reps)
        report(f"two-hot matmul line [R={R},K={K}] ({N} pts)", secs, N)

    # two-hot build variants: relu-hat form and bf16 arithmetic
    for R, K, tag in ((256, 32, "reluhat-bf16"),):
        lines = jax.random.normal(kt, (R, K), jnp.bfloat16)
        x = jax.random.uniform(ki, (N,), jnp.float32, 0.0, float(R - 1))
        CH = 1 << 15

        def op_hat(carry, ln, xs):
            def body(c, x_c):
                x_c = x_c + jnp.float32(depend(c))
                ar = jnp.arange(R, dtype=jnp.float32)[None]
                w = jax.nn.relu(1.0 - jnp.abs(ar - x_c[:, None])).astype(
                    jnp.bfloat16
                )  # hat basis == linear interp
                feats = jnp.dot(w, ln, preferred_element_type=jnp.float32)
                return c + jnp.sum(feats[:8]), 0.0

            c, _ = jax.lax.scan(body, carry, xs.reshape(-1, CH))
            return c

        run = chain(op_hat, n_iter)
        secs = timed(run, jnp.zeros(()), lines, x, reps=reps)
        report(f"two-hot {tag} [R={R},K={K}] ({N} pts)", secs, N)

    # two-hot backward shape: dV = W^T g — same matmul transposed
    R, K = 256, 32
    lines = jax.random.normal(kt, (R, K), jnp.bfloat16)
    x = jax.random.uniform(ki, (N,), jnp.float32, 0.0, float(R - 1))
    CH = 1 << 15

    def fwd_loss(ln, xs):
        def body(c, x_c):
            f0 = jnp.floor(x_c)
            fr = (x_c - f0)[:, None]
            i0 = f0.astype(jnp.int32)[:, None]
            ar = jnp.arange(R, dtype=jnp.int32)[None]
            w = ((ar == i0) * (1.0 - fr) + (ar == i0 + 1) * fr).astype(jnp.bfloat16)
            feats = jnp.dot(w, ln, preferred_element_type=jnp.float32)
            return c + jnp.sum(feats * feats), 0.0

        c, _ = jax.lax.scan(
            jax.checkpoint(body), jnp.zeros(()), xs.reshape(-1, CH)
        )
        return c

    g_fn = jax.jit(lambda ln, xs: jax.grad(fwd_loss)(ln, xs).astype(jnp.float32).sum())
    secs = timed(g_fn, lines, x, reps=reps)
    report(f"two-hot fwd+bwd line [R={R},K={K}] ({N} pts, 1 iter)", secs, N)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--fields", action="store_true",
                    help="run field-level (module) cases instead of primitives")
    ap.add_argument("--widths", action="store_true",
                    help="row-width / packed / two-hot matmul design cases")
    args = ap.parse_args()

    if args.fields:
        field_level()
        return
    if args.widths:
        width_scaling(args.quick)
        return

    N = 1 << 18 if args.quick else 1_572_864  # corner lookups per level
    T = 1 << 19
    L = 16
    reps = 2 if args.quick else 4
    n_iter = 2 if args.quick else 4

    key = jax.random.PRNGKey(0)
    kt, ki, kg = jax.random.split(key, 3)
    idx = jax.random.randint(ki, (L, N), 0, T, jnp.int32)
    results: list[tuple[str, float, float]] = []

    def report(name: str, secs: float, elements: int):
        per = secs / n_iter
        results.append((name, per * 1e3, per / elements * 1e9))
        print(f"{name:55s} {per * 1e3:10.2f} ms  {per / elements * 1e9:8.2f} ns/el", flush=True)

    # NOTE on the carry perturbation: every op must DEPEND on the loop carry
    # or XLA hoists it out of the fori_loop and the bench measures 1/n_iter
    # of the true cost (this bug made gather look 4x faster than reality —
    # 1.8ns/el reported vs 7.3ns/el measured in real graphs). The
    # ``jnp.int32(jnp.abs(c) > 1e30)`` term is 0 at runtime but not
    # constant-foldable.
    def depend(c):
        return jnp.int32(jnp.abs(c) > 1e30)

    # ------------------------------------------------------------------
    # 1. fused gather, stacked levels (the current forward path)
    # ------------------------------------------------------------------
    for F, pre_t, dt in ((2, True, jnp.float32), (8, True, jnp.float32),
                         (2, False, jnp.float32), (2, True, jnp.bfloat16)):
        table_ltf = jax.random.normal(kt, (L * T, F), dt)
        table_t = jnp.asarray(np.asarray(table_ltf).T)
        level_off = (jnp.arange(L, dtype=jnp.int32) * T)[:, None]
        flat = idx + level_off

        if pre_t:
            def op(carry, tbl, fi):
                g = jnp.take(tbl, fi + depend(carry), axis=1)  # [F, L, N]
                return carry + jnp.sum(g[:, :, :8].astype(jnp.float32))

            run = chain(op, n_iter)
            secs = timed(run, jnp.zeros(()), table_t, flat, reps=reps)
            tag = f"gather stacked [F={F} {dt.__name__}] pre-T"
        else:
            def op(carry, tbl, fi):
                g = jnp.take(tbl.T, fi + depend(carry), axis=1)
                return carry + jnp.sum(g[:, :, :8].astype(jnp.float32))

            run = chain(op, n_iter)
            secs = timed(run, jnp.zeros(()), table_ltf, flat, reps=reps)
            tag = f"gather stacked [F={F} {dt.__name__}] in-graph T"
        report(f"{tag} ({L}x{N} idx)", secs, L * N)

    # ------------------------------------------------------------------
    # 1b. windowed gather for DENSE levels: one gather fetching the whole
    # [2,2,2,F] corner neighborhood vs 8 scalar row gathers. If the windowed
    # form is < 8x the per-index cost, dense levels should use it.
    # ------------------------------------------------------------------
    RES = 64  # a dense level: res^3 = 262144 <= 2^19
    n_cells = N // 8  # same total corner count as one level above
    table_d = jax.random.normal(kt, (RES, RES, RES, 2), jnp.float32)
    base = jax.random.randint(ki, (n_cells, 3), 0, RES - 1, jnp.int32)

    def op_window(carry, tbl, b):
        starts = b + depend(carry)
        g = jax.vmap(
            lambda s: jax.lax.dynamic_slice(tbl, (s[0], s[1], s[2], 0), (2, 2, 2, 2))
        )(starts)
        return carry + jnp.sum(g[:8].astype(jnp.float32))

    run = chain(op_window, n_iter)
    secs = timed(run, jnp.zeros(()), table_d, base, reps=reps)
    report(f"windowed dense gather [2,2,2,F=2] ({n_cells} cells)", secs, n_cells)

    # same corner count via 8 scalar-index row gathers (the current path)
    tflat_t = jnp.asarray(np.asarray(table_d.reshape(-1, 2)).T)
    corner_off = jnp.asarray(
        [[i * RES * RES + j * RES + k for i in (0, 1) for j in (0, 1) for k in (0, 1)]],
        jnp.int32,
    )  # [1, 8]
    flat_base = base[:, 0] * RES * RES + base[:, 1] * RES + base[:, 2]
    idx8 = flat_base[:, None] + corner_off  # [n_cells, 8]

    def op_8row(carry, tbl, fi):
        g = jnp.take(tbl, fi + depend(carry), axis=1)
        return carry + jnp.sum(g[:, :8].astype(jnp.float32))

    run = chain(op_8row, n_iter)
    secs = timed(run, jnp.zeros(()), tflat_t, idx8, reps=reps)
    report(f"8x row gather same corners ({n_cells} cells)", secs, n_cells)

    # ------------------------------------------------------------------
    # 2. scatter-add: scalar (feature folded into index), per level
    # ------------------------------------------------------------------
    for F in (2,):
        vals = jax.random.normal(kg, (N * F,), jnp.float32)
        sidx = (idx[0][:, None] * F + jnp.arange(F, dtype=jnp.int32)[None]).reshape(-1)

        def op_sc(carry, si, v):
            d = jnp.zeros((T * F,), jnp.float32).at[si].add(v + carry)
            return jnp.sum(d[:8])

        run = chain(op_sc, n_iter)
        secs = timed(run, jnp.zeros(()), sidx, vals, reps=reps)
        report(f"scatter scalar [F={F}] (1 level, {N * F} updates)", secs, N * F)

    # ------------------------------------------------------------------
    # 3. scatter-add: row, varying F
    # ------------------------------------------------------------------
    for F in (2, 4, 8, 16):
        vals = jax.random.normal(kg, (N, F), jnp.float32)

        def op_row(carry, si, v):
            d = jnp.zeros((T, F), jnp.float32).at[si].add(v + carry)
            return jnp.sum(d[:8, :])

        run = chain(op_row, n_iter)
        secs = timed(run, jnp.zeros(()), idx[0], vals, reps=reps)
        report(f"scatter row [F={F}] (1 level, {N} rows)", secs, N)

    # ------------------------------------------------------------------
    # 4. sort costs (key-value) — feeds any segment-sum strategy
    # ------------------------------------------------------------------
    for n_sort in (N, 4 * N):
        keys_ = jax.random.randint(ki, (n_sort,), 0, T, jnp.int32)
        vals_ = jax.random.normal(kg, (n_sort,), jnp.float32)

        def op_sort(carry, k_, v_):
            sk, sv = jax.lax.sort_key_val(k_ + depend(carry), v_)
            return jnp.sum(sv[:8]) + sk[0].astype(jnp.float32) * 0

        run = chain(op_sort, n_iter)
        secs = timed(run, jnp.zeros(()), keys_, vals_, reps=reps)
        report(f"sort_key_val ({n_sort} el)", secs, n_sort)

    # ------------------------------------------------------------------
    # 5. one-hot matmul segment-sum (small tables only)
    # ------------------------------------------------------------------
    for T_small in (4096, 16384):
        idx_s = jax.random.randint(ki, (N,), 0, T_small, jnp.int32)
        vals = jax.random.normal(kg, (N, 2), jnp.float32)
        CH = 1 << 15  # chunk of points per onehot block

        def op_oh(carry, si, v):
            def body(c, args):
                si_c, v_c = args
                oh = (
                    si_c[:, None] == jnp.arange(T_small, dtype=jnp.int32)[None]
                ).astype(jnp.bfloat16)
                return (
                    c
                    + jnp.dot(
                        oh.T, v_c.astype(jnp.bfloat16), preferred_element_type=jnp.float32
                    ),
                    0.0,
                )

            d, _ = jax.lax.scan(
                body,
                jnp.zeros((T_small, 2), jnp.float32),
                (si.reshape(-1, CH), (v + carry).reshape(-1, CH, 2)),
            )
            return jnp.sum(d[:8])

        run = chain(op_oh, n_iter)
        secs = timed(run, jnp.zeros(()), idx_s, vals, reps=reps)
        report(f"onehot-matmul segsum [T={T_small}] ({N} el)", secs, N)

    # ------------------------------------------------------------------
    # 6. sorted segment-sum: sort + diff-mask + scatter of unique rows
    # ------------------------------------------------------------------
    vals = jax.random.normal(kg, (N,), jnp.float32)

    def op_seg(carry, k_, v_):
        sk, sv = jax.lax.sort_key_val(k_, v_ + carry)
        csum = jnp.cumsum(sv)
        is_last = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones((1,), bool)])
        seg_end = jnp.where(is_last, csum, 0.0)
        prev = jnp.concatenate([jnp.zeros((1,)), jnp.where(is_last, csum, 0.0)[:-1]])
        # scatter only unique rows (still N stores worst-case)
        d = jnp.zeros((T,), jnp.float32).at[jnp.where(is_last, sk, T)].add(
            seg_end - jnp.maximum.accumulate(prev), mode="drop"
        )
        return jnp.sum(d[:8])

    run = chain(op_seg, n_iter)
    secs = timed(run, jnp.zeros(()), idx[0], vals, reps=reps)
    report(f"sort+cumsum+unique-scatter ({N} el)", secs, N)

    print("\nSummary (ns/el):")
    for name, ms, ns in results:
        print(f"  {name:55s} {ns:8.2f}")


if __name__ == "__main__":
    main()
