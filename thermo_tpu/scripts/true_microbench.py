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


def loop_cost(body, init, iters: int = 32):
    """Median wall time of ONE body application, tunnel-RTT-cancelled.

    ``body(i, carry) -> carry``. Returns seconds per iteration.
    """
    import jax
    from jax import lax

    def run(k):
        f = jax.jit(lambda c: lax.fori_loop(0, k, body, c))
        return _timed_call(f, init)

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

    # ---------------- gather ----------------
    if want("gather"):
        M = 1 << 21
        print(f"gather: M={M} indices, cost per INDEX (loop-in-jit)", flush=True)
        for log2t, F in ((19, 2), (19, 8), (15, 2), (12, 2)):
            T = 1 << log2t
            tbl = jnp.asarray(rng.normal(size=(F, 16 * T)), jnp.float32)
            idx0 = jnp.asarray(rng.integers(0, 16 * T, (M,)), jnp.int32)

            def body(i, c, tbl=tbl, idx0=idx0, T=T):
                idx = (idx0 + i) & (16 * T - 1)
                return c + jnp.take(tbl, idx, axis=1).sum()

            secs = loop_cost(body, jnp.float32(0))
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

            def body(i, c, idx0=idx0, vals=vals, T=T):
                idx = (idx0 + i) & (T - 1)
                return c + jnp.zeros((T,), jnp.float32).at[idx].add(vals).sum()

            secs = loop_cost(body, jnp.float32(0), iters=16)
            print(f"  T=2^{log2t}: {secs*1e3:8.2f} ms ({secs/M*1e9:5.2f} ns/update)",
                  flush=True)

    # ---------------- CP two-hot variants ----------------
    if want("cp"):
        N, R, K = 4096 * 256, 128, 32
        coords0 = jnp.asarray(rng.uniform(0, R - 1, (N,)), jnp.float32)
        lines = jnp.asarray(rng.normal(size=(R, K)), jnp.float32)
        print(f"CP line-interp (N={N}, R={R}, K={K}) fwd:", flush=True)

        from thermo_tpu.ops.lowrank import line_interp

        def mk(fn):
            def body(i, c):
                coords = jnp.minimum(coords0 + 1e-6 * i, float(R - 1))
                return c + fn(lines, coords).sum()
            return body

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

        for name, fn in (("current line_interp (map+remat)", line_interp),
                         ("one big bf16 matmul", big_bf16),
                         ("2-row gather + lerp", row_gather)):
            secs = loop_cost(mk(fn), jnp.float32(0), iters=8)
            print(f"  {name:34s} {secs*1e3:8.2f} ms ({secs/N*1e9:5.2f} ns/sample)",
                  flush=True)

        # fwd+bwd through each
        print("CP line-interp fwd+bwd (d/dlines):", flush=True)
        for name, fn in (("current line_interp (map+remat)", line_interp),
                         ("one big bf16 matmul", big_bf16),
                         ("2-row gather + lerp", row_gather)):
            def body(i, c, fn=fn):
                coords = jnp.minimum(coords0 + 1e-6 * i, float(R - 1))
                g = jax.grad(lambda l: fn(l, coords).sum())(lines)
                return c + g.sum()
            secs = loop_cost(body, jnp.float32(0), iters=8)
            print(f"  {name:34s} {secs*1e3:8.2f} ms ({secs/N*1e9:5.2f} ns/sample)",
                  flush=True)

    # ---------------- full hash encode at workload shapes ----------------
    if want("encode"):
        from thermo_tpu.ops.hash_encoding import (
            HashGridSpec, hash_encode, init_hash_table,
        )

        key = jax.random.PRNGKey(0)
        print("hash_encode at workload shapes (4096 rays x 48 samples, "
              "L=16 F=2 T=2^19):", flush=True)
        spec = HashGridSpec()
        table = init_hash_table(key, spec)
        N = 4096 * 48
        pos0 = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)

        for name, kw in (("fwd exact", dict()),
                         ("fwd stoch k=2", dict(fwd_corners=2))):
            def body(i, c, kw=kw):
                p = jnp.minimum(pos0 + 1e-7 * i, 1.0)
                return c + hash_encode(table, p, spec, **kw).sum()
            secs = loop_cost(body, jnp.float32(0), iters=8)
            ns = secs / (N * 16 * 8) * 1e9
            print(f"  {name:26s} {secs*1e3:8.2f} ms ({ns:5.2f} ns/corner-8basis)",
                  flush=True)

        for name, kw in (("fwd+bwd exact", dict()),
                         ("fwd+bwd grad_corners=2", dict(grad_corners=2)),
                         ("fwd+bwd grad_corners=1", dict(grad_corners=1)),
                         ("fwd+bwd stoch fwd k=2", dict(fwd_corners=2))):
            def body(i, c, kw=kw):
                p = jnp.minimum(pos0 + 1e-7 * i, 1.0)
                g = jax.grad(
                    lambda t: hash_encode(t, p, spec, **kw).sum()
                )(table)
                return c + g.sum()
            secs = loop_cost(body, jnp.float32(0), iters=8)
            print(f"  {name:26s} {secs*1e3:8.2f} ms", flush=True)

    # ---------------- MLP stack at workload shapes ----------------
    if want("mlp"):
        print("final-field MLP stack (196K samples, 32->64->64->16 + heads):",
              flush=True)
        N = 4096 * 48
        x0 = jnp.asarray(rng.normal(size=(N, 32)), jnp.bfloat16)
        ws = [jnp.asarray(rng.normal(size=s), jnp.bfloat16) * 0.1
              for s in ((32, 64), (64, 64), (64, 16), (31, 64), (64, 64),
                        (64, 64), (64, 3), (15, 64), (64, 64), (64, 1))]

        def body(i, c):
            x = x0 + jnp.bfloat16(1e-3) * i
            h = jax.nn.relu(x @ ws[0])
            h = jax.nn.relu(h @ ws[1])
            geo = h @ ws[2]
            h2 = jax.nn.relu(jnp.concatenate(
                [geo[:, 1:], jnp.tile(x[:, :16], (1, 1))], axis=-1) @ ws[7])
            h2 = jax.nn.relu(h2 @ ws[8])
            th = h2 @ ws[9]
            return c + (geo.sum() + th.sum()).astype(jnp.float32)

        secs = loop_cost(body, jnp.float32(0), iters=16)
        print(f"  fwd {secs*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
