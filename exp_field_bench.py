"""One-off: attribute the forward's table cost. Times raw hash_encode and
field.apply at exact model shapes on the real TPU."""
import time
import numpy as np
import jax, jax.numpy as jnp
from thermo_tpu.ops.hash_encoding import HashGridSpec, hash_encode, init_hash_table

def sync(x): return float(jnp.ravel(x)[0])
def timed(fn, *a, reps=3):
    o = fn(*a); sync(o)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); o = fn(*a); sync(o); ts.append(time.perf_counter()-t0)
    return float(np.median(ts))

key = jax.random.PRNGKey(0)
# final field spec
spec = HashGridSpec()
table = init_hash_table(key, spec)
p_final = jax.random.uniform(key, (196608, 3))
p_prop  = jax.random.uniform(key, (1048576, 3))
spec_prop = HashGridSpec(num_levels=5, log2_hashmap_size=17, max_res=128)
table_prop = init_hash_table(key, spec_prop)

cases = {
  "hash_encode final (196K pts, 16 lv)": (lambda t, p: jnp.sum(hash_encode(t, p, spec)[:2]), table, p_final),
  "hash_encode prop exact (1.05M pts, 5 lv)": (lambda t, p: jnp.sum(hash_encode(t, p, spec_prop)[:2]), table_prop, p_prop),
  "hash_encode prop fwd2 (1.05M pts, 5 lv)": (lambda t, p: jnp.sum(hash_encode(t, p, spec_prop, fwd_corners=2)[:2]), table_prop, p_prop),
}
for name, (f, t, p) in cases.items():
    fn = jax.jit(f)
    print(f"{name:45s} {timed(fn, t, p)*1e3:8.1f} ms", flush=True)

# full field apply at model shapes
from thermo_tpu.models.field import ThermalNerfactoField, HashMLPDensityField
field = ThermalNerfactoField(aabb=((-1.,)*3,(1.,)*3), num_images=8)
pos = jax.random.uniform(key, (4096, 48, 3), minval=-0.8, maxval=0.8)
dirs = pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
cam = jnp.zeros((4096, 48), jnp.int32)
v = field.init(key, pos, dirs, cam)
fn = jax.jit(lambda prm: jnp.sum(field.apply({"params": prm}, pos, dirs, cam)["rgb"][:2]))
print(f"{'field.apply (4096x48)':45s} {timed(fn, v['params'])*1e3:8.1f} ms", flush=True)

prop = HashMLPDensityField(aabb=((-1.,)*3,(1.,)*3))
pp = jax.random.uniform(key, (4096, 257, 3), minval=-0.8, maxval=0.8)
vp = prop.init(key, pp)
fnp = jax.jit(lambda prm: jnp.sum(prop.apply({"params": prm}, pp)[:2]))
print(f"{'prop.apply exact (4096x257)':45s} {timed(fnp, vp['params'])*1e3:8.1f} ms", flush=True)
prop2 = HashMLPDensityField(aabb=((-1.,)*3,(1.,)*3), fwd_corners=2)
vp2 = prop2.init(key, pp)
fnp2 = jax.jit(lambda prm: jnp.sum(prop2.apply({"params": prm}, pp)[:2]))
print(f"{'prop.apply fwd2 (4096x257)':45s} {timed(fnp2, vp2['params'])*1e3:8.1f} ms", flush=True)
