"""Microbench: two-hot line-interpolation variants + gather width/table scaling.

Run: python -m thermo_tpu.scripts.cp_microbench
"""

from __future__ import annotations

import time

import numpy as np


def timed(fn, *args, reps: int = 5) -> float:
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.ravel(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.ravel(out)[0])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/thermo_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    N = 4096 * 256  # proposal-0 workload
    R, K = 128, 32

    coords = jnp.asarray(rng.uniform(0, R - 1, (N,)), jnp.float32)
    lines = jnp.asarray(rng.normal(size=(R, K)), jnp.float32)

    def report(name, secs):
        print(f"  {name:40s} {secs*1e3:8.2f} ms  ({secs/N*1e9:5.2f} ns/sample)",
              flush=True)

    print(f"Two-hot line interp variants (N={N}, R={R}, K={K}):", flush=True)

    # current: f32 W, lax.map over 32768-chunks, remat
    def v_current(lines, coords):
        from thermo_tpu.ops.lowrank import line_interp
        return line_interp(lines, coords).sum()

    report("current (f32 W, map 32k, remat)", timed(jax.jit(v_current), lines, coords))

    # one big matmul, bf16 W, no chunking
    def v_big_bf16(lines, coords):
        i0 = jnp.clip(jnp.floor(coords), 0.0, float(R - 2))
        fr = (coords - i0)[:, None]
        i0 = i0.astype(jnp.int32)[:, None]
        ar = jnp.arange(R, dtype=jnp.int32)[None]
        w = ((ar == i0) * (1.0 - fr) + (ar == i0 + 1) * fr).astype(jnp.bfloat16)
        return jnp.dot(w, lines.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32).sum()

    report("big matmul bf16 W", timed(jax.jit(v_big_bf16), lines, coords))

    # one big matmul, build W directly in bf16 via where (no f32 intermediate)
    def v_big_where(lines, coords):
        i0 = jnp.clip(jnp.floor(coords), 0.0, float(R - 2))
        fr = (coords - i0)[:, None].astype(jnp.bfloat16)
        i0 = i0.astype(jnp.int32)[:, None]
        ar = jnp.arange(R, dtype=jnp.int32)[None]
        w = jnp.where(ar == i0, (1 - fr), 0).astype(jnp.bfloat16) + jnp.where(
            ar == i0 + 1, fr, 0
        ).astype(jnp.bfloat16)
        return jnp.dot(w, lines.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32).sum()

    report("big matmul bf16 where-W", timed(jax.jit(v_big_where), lines, coords))

    # row-gather variant: 2 row gathers of K floats + lerp
    def v_gather(lines, coords):
        i0 = jnp.clip(jnp.floor(coords), 0.0, float(R - 2))
        fr = (coords - i0)[:, None]
        i0 = i0.astype(jnp.int32)
        a = jnp.take(lines, i0, axis=0)
        b = jnp.take(lines, i0 + 1, axis=0)
        return (a * (1 - fr) + b * fr).sum()

    report("2-row gather + lerp", timed(jax.jit(v_gather), lines, coords))

    # gather with lines transposed [K, R] (K-major gather)
    def v_gather_t(lines, coords):
        lt = lines.T  # [K, R]
        i0 = jnp.clip(jnp.floor(coords), 0.0, float(R - 2))
        fr = (coords - i0)[None, :]
        i0 = i0.astype(jnp.int32)
        a = jnp.take(lt, i0, axis=1)  # [K, N]
        b = jnp.take(lt, i0 + 1, axis=1)
        return (a * (1 - fr) + b * fr).sum()

    report("2-col gather [K,R] + lerp", timed(jax.jit(v_gather_t), lines, coords))

    # ---- gather scaling: cost per index vs width and table size ----
    print("Gather cost vs width/table (1.57M indices):", flush=True)
    M = 1 << 21
    for log2t, width in ((19, 2), (19, 4), (19, 8), (19, 16), (17, 8), (15, 8), (12, 8)):
        T = 1 << log2t
        tbl = jnp.asarray(rng.normal(size=(width, T)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, T, (M,)), jnp.int32)

        def g(tbl, idx):
            return jnp.take(tbl, idx, axis=1).sum()

        secs = timed(jax.jit(g), tbl, idx)
        print(f"  T=2^{log2t} width={width:2d}: {secs*1e3:8.2f} ms "
              f"({secs/M*1e9:5.2f} ns/index)", flush=True)

    # scatter scaling vs table size
    print("Scalar scatter-add cost vs table (1.57M updates):", flush=True)
    for log2t in (22, 19, 17, 15, 12):
        T = 1 << log2t
        idx = jnp.asarray(rng.integers(0, T, (M,)), jnp.int32)
        vals = jnp.asarray(rng.normal(size=(M,)), jnp.float32)

        def s(idx, vals):
            return jnp.zeros((T,), jnp.float32).at[idx].add(vals).sum()

        secs = timed(jax.jit(s), idx, vals)
        print(f"  T=2^{log2t}: {secs*1e3:8.2f} ms ({secs/M*1e9:5.2f} ns/update)",
              flush=True)


if __name__ == "__main__":
    main()
