"""Forward-pass micro-attribution for the thermal-nerf-tpu preset.

Times each forward component in isolation at workload shapes:
  * CP proposal encode+MLP at 4096x256 and 4096x96 samples
  * hash proposal (reference preset) at the same shapes
  * final-field hash encode alone (4096x48 samples)
  * final-field MLPs alone (base + heads) on precomputed features
  * PDF resampling (searchsorted) alone
  * compositing + losses alone

Run: python -m thermo_tpu.scripts.fwd_breakdown
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

    from thermo_tpu.models.field import (
        CPDensityField,
        HashMLPDensityField,
        ThermalNerfactoField,
    )
    from thermo_tpu.ops.hash_encoding import HashGridSpec, hash_encode, init_hash_table
    from thermo_tpu.ops.math import searchsorted

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    R = 4096

    def report(name, secs, note=""):
        print(f"  {name:34s} {secs*1e3:8.2f} ms {note}", flush=True)

    print("Forward micro-attribution (4096 rays):", flush=True)

    # ---- proposal fields at workload shapes ----
    for S in (256, 96):
        pos = jnp.asarray(rng.uniform(-1.5, 1.5, (R, S, 3)), jnp.float32)
        cp = CPDensityField(aabb=((-1.0,) * 3, (1.0,) * 3), resolution=128, rank=32)
        p_cp = cp.init(key, pos)["params"]
        f_cp = jax.jit(lambda p, x: cp.apply({"params": p}, x).sum())
        report(f"cp_proposal[{S}]", timed(f_cp, p_cp, pos))

        hp = HashMLPDensityField(aabb=((-1.0,) * 3, (1.0,) * 3))
        p_hp = hp.init(key, pos)["params"]
        f_hp = jax.jit(lambda p, x: hp.apply({"params": p}, x).sum())
        report(f"hash_proposal[{S}] (exact fwd)", timed(f_hp, p_hp, pos))

    # ---- final-field hash encode alone, tpu preset (L=4, F=8, T=2^19) ----
    S = 48
    pos01 = jnp.asarray(rng.uniform(0, 1, (R * S, 3)), jnp.float32)
    for L, F in ((4, 8), (16, 2)):
        spec = HashGridSpec(num_levels=L, features_per_level=F)
        table = init_hash_table(key, spec)
        enc = jax.jit(lambda t, p, s=spec: hash_encode(t, p, s).sum())
        report(f"final_hash_encode L={L} F={F}", timed(enc, table, pos01))

    # ---- full final field (encode + MLPs + heads) ----
    pos = jnp.asarray(rng.uniform(-0.9, 0.9, (R, S, 3)), jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(R, S, 3)), jnp.float32)
    cams = jnp.zeros((R, S), jnp.int32)
    for L, F in ((4, 8), (16, 2)):
        field = ThermalNerfactoField(
            aabb=((-1.0,) * 3, (1.0,) * 3), num_images=8, num_levels=L,
            features_per_level=F,
        )
        pf = field.init(key, pos, dirs, cams)["params"]
        ff = jax.jit(
            lambda p, x, d, c, f=field: sum(
                v.sum()
                for k, v in f.apply({"params": p}, x, d, c, train=True).items()
            )
        )
        report(f"final_field_full L={L} F={F}", timed(ff, pf, pos, dirs, cams))

    # ---- PDF resampling cost (searchsorted at workload shapes) ----
    cdf = jnp.sort(jnp.asarray(rng.uniform(0, 1, (R, 257)), jnp.float32), axis=-1)
    u = jnp.asarray(rng.uniform(0, 1, (R, 97)), jnp.float32)
    ss = jax.jit(lambda c, x: searchsorted(c, x).sum())
    report("searchsorted[257->97]", timed(ss, cdf, u))


if __name__ == "__main__":
    main()
