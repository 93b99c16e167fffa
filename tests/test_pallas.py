"""Pallas kernel tests (interpret mode on CPU): the fused composite must
match the reference XLA compositing ops exactly."""

import numpy as np
import jax
import jax.numpy as jnp

from thermo_tpu.ops import rendering as R
from thermo_tpu.ops.pallas.composite import fused_composite


class TestFusedComposite:
    def _inputs(self, rays=512, S=48, seed=0):
        rng = np.random.default_rng(seed)
        t = np.sort(rng.uniform(0.05, 10.0, size=(rays, S + 1)), axis=-1)
        starts = jnp.asarray(t[:, :-1, None], jnp.float32)
        ends = jnp.asarray(t[:, 1:, None], jnp.float32)
        density = jnp.asarray(rng.uniform(0, 2, size=(rays, S, 1)), jnp.float32)
        rgb = jnp.asarray(rng.uniform(size=(rays, S, 3)), jnp.float32)
        thermal = jnp.asarray(rng.uniform(size=(rays, S, 1)), jnp.float32)
        return density, starts, ends, rgb, thermal

    def test_matches_xla_reference(self):
        density, starts, ends, rgb, thermal = self._inputs()
        out = fused_composite(density, starts, ends, rgb, thermal, interpret=True)
        w = R.render_weights(density, starts, ends)
        np.testing.assert_allclose(
            np.asarray(out["accumulation"]), np.asarray(R.render_accumulation(w)),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(out["rgb"]),
            np.asarray(R.render_rgb(rgb, w, background="last_sample")),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["thermal"]), np.asarray(R.render_thermal(thermal, w)),
            rtol=1e-4, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["depth"]),
            np.asarray(R.render_depth_median(w, starts, ends)),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["expected_depth"]),
            np.asarray(R.render_depth_expected(w, starts, ends)),
            rtol=1e-4, atol=1e-5,
        )

    def test_ragged_ray_count(self):
        # R not a multiple of the block size: padded grid must still be exact
        density, starts, ends, rgb, thermal = self._inputs(rays=300)
        out = fused_composite(density, starts, ends, rgb, thermal, interpret=True)
        w = R.render_weights(density, starts, ends)
        np.testing.assert_allclose(
            np.asarray(out["accumulation"]), np.asarray(R.render_accumulation(w)),
            rtol=1e-5, atol=1e-6,
        )
