"""Tunnel-proof microbench: loops the op INSIDE jit and differences two
iteration counts, so per-call tunnel RTT / dispatch overhead cancels.

The remote-TPU tunnel in this environment adds a large constant latency to
every host fetch; timing one op per fetch (kernel_microbench.py style)
measures mostly RTT for anything under ~10ms and made gathers look "flat"
at ~15ns/index regardless of size. Here each measurement runs the op K and
2K times inside one compiled ``lax.fori_loop`` (with an iteration-dependent
input twist so XLA cannot hoist the body), and the reported cost is
``(t_2K - t_K) / K``.

Run: python -m thermo_tpu.scripts.true_microbench [--section all]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _timed_call(fn, *args) -> float:
    import jax.numpy as jnp

    out = fn(*args)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.ravel(out)[0])  # host fetch = the only reliable sync here
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def loop_cost(body, init, iters: int = 32, *operands):
    """Median wall time of ONE body application, tunnel-RTT-cancelled.

    ``body(i, carry, *operands) -> carry``. Operands are passed as jit
    ARGUMENTS (closed-over device arrays would be baked into the HLO as
    constants — the remote-compile tunnel rejects multi-MB payloads with
    HTTP 413). Returns seconds per iteration.
    """
    import jax
    from jax import lax

    def run(k):
        def f(c, *ops):
            return lax.fori_loop(0, k, lambda i, cc: body(i, cc, *ops), c)

        return _timed_call(jax.jit(f), init, *operands)

    t1 = run(iters)
    t2 = run(2 * iters)
    return max(t2 - t1, 1e-9) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all",
                    help="comma list: gather,scatter,cp,encode,mlp")
    args = ap.parse_args()
    sections = set(args.section.split(","))

    def want(s):
        return "all" in sections or s in sections

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/thermo_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    zero = jnp.float32(0)

    # ---------------- gather ----------------
    if want("gather"):
        M = 1 << 21
        print(f"gather: M={M} indices, cost per INDEX (loop-in-jit)", flush=True)
        for log2t, F in ((19, 2), (19, 8), (15, 2), (12, 2)):
            T16 = 16 << log2t
            tbl = jnp.asarray(rng.normal(size=(F, T16)), jnp.float32)
            idx0 = jnp.asarray(rng.integers(0, T16, (M,)), jnp.int32)

            def body(i, c, tbl, idx0, T16=T16):
                idx = (idx0 + i) & (T16 - 1)
                return c + jnp.take(tbl, idx, axis=1).sum()

            secs = loop_cost(body, zero, 16, tbl, idx0)
            print(f"  T=16x2^{log2t} F={F}: {secs*1e3:8.2f} ms "
                  f"({secs/M*1e9:5.2f} ns/index, {secs/M/F*1e9:5.2f} ns/el)",
                  flush=True)

    # ---------------- scatter ----------------
    if want("scatter"):
        M = 1 << 21
        print(f"scatter-add (scalar): M={M} updates", flush=True)
        for log2t in (23, 19, 15):
            T = 1 << log2t
            idx0 = jnp.asarray(rng.integers(0, T, (M,)), jnp.int32)
            vals = jnp.asarray(rng.normal(size=(M,)), jnp.float32)

            def body(i, c, idx0, vals, T=T):
                idx = (idx0 + i) & (T - 1)
                return c + jnp.zeros((T,), jnp.float32).at[idx].add(vals).sum()

            secs = loop_cost(body, zero, 8, idx0, vals)
            print(f"  T=2^{log2t}: {secs*1e3:8.2f} ms ({secs/M*1e9:5.2f} ns/update)",
                  flush=True)

    # ---------------- CP two-hot variants ----------------
    if want("cp"):
        N, R, K = 4096 * 256, 128, 32
        coords0 = jnp.asarray(rng.uniform(0, R - 1, (N,)), jnp.float32)
        lines = jnp.asarray(rng.normal(size=(R, K)), jnp.float32)
        print(f"CP line-interp (N={N}, R={R}, K={K}):", flush=True)

        from thermo_tpu.ops.lowrank import line_interp

        def big_bf16(lines, coords):
            i0 = jnp.clip(jnp.floor(coords), 0.0, float(R - 2))
            fr = (coords - i0)[:, None]
            i0i = i0.astype(jnp.int32)[:, None]
            ar = jnp.arange(R, dtype=jnp.int32)[None]
            w = ((ar == i0i) * (1.0 - fr) + (ar == i0i + 1) * fr).astype(jnp.bfloat16)
            return jnp.dot(w, lines.astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        def row_gather(lines, coords):
            i0 = jnp.clip(jnp.floor(coords), 0.0, float(R - 2))
            fr = (coords - i0)[:, None]
            i0i = i0.astype(jnp.int32)
            a = jnp.take(lines, i0i, axis=0)
            b = jnp.take(lines, i0i + 1, axis=0)
            return a * (1 - fr) + b * fr

        cases = (("current line_interp (map+remat)", line_interp),
                 ("one big bf16 matmul", big_bf16),
                 ("2-row gather + lerp", row_gather))

        for name, fn in cases:
            def body(i, c, lines, coords0, fn=fn):
                coords = jnp.minimum(coords0 + 1e-6 * i, float(R - 1))
                return c + fn(lines, coords).sum()
            secs = loop_cost(body, zero, 8, lines, coords0)
            print(f"  fwd     {name:34s} {secs*1e3:8.2f} ms "
                  f"({secs/N*1e9:5.2f} ns/sample)", flush=True)

        for name, fn in cases:
            def body(i, c, lines, coords0, fn=fn):
                coords = jnp.minimum(coords0 + 1e-6 * i, float(R - 1))
                g = jax.grad(lambda l: fn(l, coords).sum())(lines)
                return c + g.sum()
            secs = loop_cost(body, zero, 8, lines, coords0)
            print(f"  fwd+bwd {name:34s} {secs*1e3:8.2f} ms "
                  f"({secs/N*1e9:5.2f} ns/sample)", flush=True)

    # ---------------- full hash encode at workload shapes ----------------
    if want("encode"):
        from thermo_tpu.ops.hash_encoding import (
            HashGridSpec, hash_encode, init_hash_table,
        )

        key = jax.random.PRNGKey(0)
        N = 4096 * 48
        pos0 = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
        for L, F in ((16, 2), (4, 8)):
            spec = HashGridSpec(num_levels=L, features_per_level=F)
            table = init_hash_table(key, spec)
            print(f"hash_encode (4096x48 samples, L={L} F={F} T=2^19):",
                  flush=True)

            for name, kw in (("fwd exact", dict()),
                             ("fwd stoch k=2", dict(fwd_corners=2))):
                def body(i, c, table, pos0, kw=kw, spec=spec):
                    p = jnp.minimum(pos0 + 1e-7 * i, 1.0)
                    return c + hash_encode(table, p, spec, **kw).sum()
                secs = loop_cost(body, zero, 8, table, pos0)
                print(f"  {name:26s} {secs*1e3:8.2f} ms", flush=True)

            for name, kw in (("fwd+bwd exact", dict()),
                             ("fwd+bwd grad_corners=2", dict(grad_corners=2)),
                             ("fwd+bwd grad_corners=1", dict(grad_corners=1)),
                             ("fwd+bwd stoch fwd k=2", dict(fwd_corners=2))):
                def body(i, c, table, pos0, kw=kw, spec=spec):
                    p = jnp.minimum(pos0 + 1e-7 * i, 1.0)
                    g = jax.grad(
                        lambda t: hash_encode(t, p, spec, **kw).sum()
                    )(table)
                    return c + g.sum()
                secs = loop_cost(body, zero, 8, table, pos0)
                print(f"  {name:26s} {secs*1e3:8.2f} ms", flush=True)

    # ---------------- MLP stack at workload shapes ----------------
    if want("mlp"):
        print("MLP matmul (1.57M samples x [64,64] bf16 chain x4):", flush=True)
        N = 4096 * 384
        x0 = jnp.asarray(rng.normal(size=(N, 64)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(64, 64)) * 0.1, jnp.bfloat16)

        def body(i, c, x0, w):
            x = x0 + jnp.bfloat16(1e-3) * jnp.bfloat16(i)
            for _ in range(4):
                x = jax.nn.relu(x @ w)
            return c + x.sum().astype(jnp.float32)

        secs = loop_cost(body, zero, 16, x0, w)
        flops = N * 64 * 64 * 2 * 4
        print(f"  fwd {secs*1e3:8.2f} ms ({flops/secs/1e12:.1f} TFLOP/s)",
              flush=True)


if __name__ == "__main__":
    main()
