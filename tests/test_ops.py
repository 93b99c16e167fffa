"""Unit tests for the pure compute ops (hash encoding, samplers, rendering,
losses) — numerical semantics the reference inherits from
nerfstudio/tcnn/nerfacc (SURVEY §2b)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from thermo_tpu.ops.contraction import scene_contraction_inf, contract_to_unit_cube
from thermo_tpu.ops.hash_encoding import HashGridSpec, hash_encode, init_hash_table
from thermo_tpu.ops.losses import (
    distortion_loss,
    interlevel_loss,
    lossfun_distortion,
    mse,
)
from thermo_tpu.ops.math import searchsorted, trunc_exp
from thermo_tpu.ops.rendering import (
    render_accumulation,
    render_depth_expected,
    render_depth_median,
    render_rgb,
    render_thermal,
    render_weights,
)
from thermo_tpu.ops.samplers import (
    ProposalSamplerConfig,
    RaySegments,
    proposal_anneal,
    proposal_sample,
    proposal_update_schedule,
    sample_pdf,
    sample_spaced,
    spacing_piecewise,
    spacing_piecewise_inv,
)
from thermo_tpu.ops.sh import sh_encoding


class TestMath:
    def test_trunc_exp_forward(self):
        x = jnp.array([-1.0, 0.0, 2.0])
        np.testing.assert_allclose(trunc_exp(x), np.exp([-1.0, 0.0, 2.0]), rtol=1e-6)

    def test_trunc_exp_gradient_clamped(self):
        g = jax.grad(lambda x: trunc_exp(x))(20.0)
        np.testing.assert_allclose(g, np.exp(15.0), rtol=1e-6)
        g = jax.grad(lambda x: trunc_exp(x))(-20.0)
        np.testing.assert_allclose(g, np.exp(-15.0), rtol=1e-6)

    @pytest.mark.parametrize("side", ["left", "right"])
    def test_searchsorted_matches_numpy(self, side):
        rng = np.random.default_rng(0)
        a = np.sort(rng.uniform(size=(4, 16)), axis=-1)
        v = rng.uniform(size=(4, 7))
        got = searchsorted(jnp.asarray(a), jnp.asarray(v), side=side)
        want = np.stack([np.searchsorted(a[i], v[i], side=side) for i in range(4)])
        np.testing.assert_array_equal(np.asarray(got), want)


    @pytest.mark.parametrize("side", ["left", "right"])
    def test_bracket_matches_index_take(self, side):
        """bracket_below/above == searchsorted + clip + take_along_axis on
        monotone value arrays, including exact ties and out-of-range
        queries (the gather-free hot-path replacement)."""
        from thermo_tpu.ops.math import bracket_above, bracket_below

        rng = np.random.default_rng(1)
        # duplicate keys (ties) + queries equal to keys + out-of-range
        keys = np.sort(
            np.round(rng.uniform(size=(4, 16)), 1), axis=-1
        )  # coarse grid -> plenty of exact ties
        vals = np.cumsum(rng.uniform(size=(4, 16)), axis=-1)  # nondecreasing
        v = np.concatenate(
            [keys[:, ::3], rng.uniform(-0.2, 1.2, size=(4, 6))], axis=-1
        )
        inds = np.stack(
            [np.searchsorted(keys[i], v[i], side=side) for i in range(4)]
        )
        lo = np.take_along_axis(vals, np.clip(inds - 1, 0, 15), axis=-1)
        hi = np.take_along_axis(vals, np.clip(inds, 0, 15), axis=-1)
        got_lo = np.asarray(
            bracket_below(jnp.asarray(keys), jnp.asarray(v), jnp.asarray(vals), side=side)
        )
        got_hi = np.asarray(
            bracket_above(jnp.asarray(keys), jnp.asarray(v), jnp.asarray(vals), side=side)
        )
        np.testing.assert_allclose(got_lo, lo, rtol=1e-6)
        np.testing.assert_allclose(got_hi, hi, rtol=1e-6)


class TestContraction:
    def test_identity_inside_unit_ball(self):
        x = jnp.array([[0.3, -0.2, 0.5]])
        np.testing.assert_allclose(scene_contraction_inf(x), x, rtol=1e-6)

    def test_contracts_to_radius_2(self):
        x = jnp.array([[100.0, 0.0, 0.0], [0.0, -1e6, 0.0]])
        out = np.asarray(scene_contraction_inf(x))
        assert np.all(np.abs(out) <= 2.0)
        np.testing.assert_allclose(out[0, 0], 2.0 - 1.0 / 100.0, rtol=1e-5)

    def test_unit_cube_range(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(100, 3)) * 10)
        p = np.asarray(contract_to_unit_cube(x))
        assert np.all(p >= 0.0) and np.all(p <= 1.0)


class TestSH:
    def test_constant_term(self):
        d = jnp.array([[0.0, 0.0, 1.0]])
        out = sh_encoding(d, levels=4)
        assert out.shape == (1, 16)
        np.testing.assert_allclose(out[0, 0], 0.28209479, rtol=1e-5)

    def test_orthonormality(self):
        # SH basis integrated over the sphere ~ identity (Monte Carlo).
        rng = np.random.default_rng(2)
        d = rng.normal(size=(200000, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        y = np.asarray(sh_encoding(jnp.asarray(d), levels=3))
        gram = 4 * np.pi * (y.T @ y) / len(d)
        np.testing.assert_allclose(gram, np.eye(9), atol=0.05)


class TestHashEncoding:
    def test_shapes_and_growth(self):
        spec = HashGridSpec(num_levels=4, base_res=16, max_res=128, log2_hashmap_size=12)
        assert spec.resolutions[0] == 16
        assert spec.resolutions[-1] == 128
        key = jax.random.PRNGKey(0)
        table = init_hash_table(key, spec)
        out = hash_encode(table, jnp.asarray([[0.5, 0.5, 0.5]]), spec)
        assert out.shape == (1, spec.out_dim)

    def test_trilinear_interpolation_consistency(self):
        # Feature at a grid vertex == table entry; midpoints interpolate.
        spec = HashGridSpec(num_levels=1, base_res=4, max_res=4, log2_hashmap_size=10)
        key = jax.random.PRNGKey(1)
        table = init_hash_table(key, spec)
        # A point exactly on a vertex of the level-0 grid: scale=3, pos=p*3+0.5
        # vertex at integer k means p = (k-0.5)/3... pick p mapping to pos=2.0.
        p = jnp.asarray([[(2.0 - 0.5) / 3.0] * 3])
        out = hash_encode(table, p, spec)
        res = int(spec.resolutions[0])
        vidx = 2 + 2 * res + 2 * res * res
        # channels-first flat table: vertex features are column vidx
        np.testing.assert_allclose(
            np.asarray(out)[0], np.asarray(table)[:, vidx], rtol=1e-5
        )

    def test_gradient_flows_to_table(self):
        spec = HashGridSpec(num_levels=2, base_res=4, max_res=8, log2_hashmap_size=8)
        table = init_hash_table(jax.random.PRNGKey(2), spec)
        p = jax.random.uniform(jax.random.PRNGKey(3), (32, 3))
        g = jax.grad(lambda t: jnp.sum(hash_encode(t, p, spec) ** 2))(table)
        assert np.asarray(jnp.abs(g)).sum() > 0

    def test_dense_matmul_path_matches_gather(self, monkeypatch):
        """The dense-level MXU einsum path (hash_encoding._dense_encode)
        must reproduce the gather path exactly: same values, same d_table,
        same d_positions — including the flat-index border overflow
        semantics at p=1 (floor+1 reading the next row/plane)."""
        import thermo_tpu.ops.hash_encoding as he

        # 3 levels: res 4, 8 dense (64, 512 <= T=1024), res 16 hashed (4096 > T)
        spec = HashGridSpec(
            num_levels=3, base_res=4, max_res=16, log2_hashmap_size=10
        )
        assert list(spec.use_hash) == [False, False, True]
        assert he._num_dense_matmul_levels(spec, 32) == 2
        table = init_hash_table(jax.random.PRNGKey(5), spec)
        p = jax.random.uniform(jax.random.PRNGKey(6), (30, 3))
        # border cases: exact 0 and 1 exercise the overflow parity
        p = jnp.concatenate([p, jnp.zeros((1, 3)), jnp.ones((1, 3))], axis=0)

        def run(t, pos):
            out = hash_encode(t, pos, spec)
            return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape))), out

        (loss_a, out_a), (gt_a, gp_a) = (
            jax.value_and_grad(run, argnums=(0, 1), has_aux=True)(table, p)
        )
        monkeypatch.setattr(he, "_DENSE_MATMUL_BUDGET", 0)
        (loss_b, out_b), (gt_b, gp_b) = (
            jax.value_and_grad(run, argnums=(0, 1), has_aux=True)(table, p)
        )
        np.testing.assert_allclose(
            np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(gt_a), np.asarray(gt_b), rtol=1e-4, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(gp_a), np.asarray(gp_b), rtol=1e-4, atol=1e-6
        )

    def test_dense_matmul_budget_seam_matches(self, monkeypatch):
        """When the budget excludes only the LARGER dense level, the mixed
        split (dense-matmul prefix + gather remainder at lo>0) equals the
        pure gather path, gradients included."""
        import thermo_tpu.ops.hash_encoding as he

        spec = HashGridSpec(
            num_levels=2, base_res=4, max_res=8, log2_hashmap_size=10
        )
        assert not spec.use_hash.any()
        table = init_hash_table(jax.random.PRNGKey(7), spec)
        p = jax.random.uniform(jax.random.PRNGKey(8), (600, 3))

        def run(t, pos):
            out = hash_encode(t, pos, spec)
            return jnp.sum(out * jnp.sin(0.1 * jnp.arange(out.size)).reshape(out.shape))

        monkeypatch.setattr(he, "_DENSE_MATMUL_BUDGET", 25_000)
        la, (gta, gpa) = jax.value_and_grad(run, argnums=(0, 1))(table, p)
        monkeypatch.setattr(he, "_DENSE_MATMUL_BUDGET", 0)
        lb, (gtb, gpb) = jax.value_and_grad(run, argnums=(0, 1))(table, p)
        np.testing.assert_allclose(float(la), float(lb), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(gta), np.asarray(gtb), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(gpa), np.asarray(gpb), rtol=1e-4, atol=1e-6
        )

    def test_continuity_across_cells(self):
        spec = HashGridSpec(num_levels=8, base_res=16, max_res=512, log2_hashmap_size=14)
        table = init_hash_table(jax.random.PRNGKey(4), spec)
        p = jnp.asarray([[0.3, 0.4, 0.5]])
        eps = 1e-6
        a = hash_encode(table, p, spec)
        b = hash_encode(table, p + eps, spec)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


class TestRendering:
    def _segs(self, R=4, S=8):
        rng = np.random.default_rng(3)
        t = np.sort(rng.uniform(0.1, 5.0, size=(R, S + 1)), axis=-1)
        starts = jnp.asarray(t[:, :-1, None], jnp.float32)
        ends = jnp.asarray(t[:, 1:, None], jnp.float32)
        density = jnp.asarray(rng.uniform(0, 3, size=(R, S, 1)), jnp.float32)
        return density, starts, ends

    def test_weights_sum_leq_one(self):
        density, starts, ends = self._segs()
        w = render_weights(density, starts, ends)
        acc = np.asarray(render_accumulation(w))
        assert np.all(acc <= 1.0 + 1e-5) and np.all(acc >= 0.0)

    def test_opaque_ray_first_sample(self):
        # A huge density in the first sample should dominate.
        density = jnp.zeros((1, 4, 1)).at[0, 0, 0].set(1e4)
        starts = jnp.arange(4.0).reshape(1, 4, 1)
        ends = starts + 1.0
        w = np.asarray(render_weights(density, starts, ends))
        np.testing.assert_allclose(w[0, 0, 0], 1.0, rtol=1e-5)
        np.testing.assert_allclose(w[0, 1:, 0], 0.0, atol=1e-6)

    def test_thermal_last_sample_background(self):
        # Zero density -> output equals the last sample's thermal value.
        density = jnp.zeros((2, 4, 1))
        starts = jnp.broadcast_to(jnp.arange(4.0).reshape(1, 4, 1), (2, 4, 1))
        ends = starts + 1.0
        w = render_weights(density, starts, ends)
        thermal = jnp.asarray(
            np.random.default_rng(4).uniform(size=(2, 4, 1)), jnp.float32
        )
        out = np.asarray(render_thermal(thermal, w, train=True))
        np.testing.assert_allclose(out, np.asarray(thermal)[:, -1], rtol=1e-5)

    def test_rgb_backgrounds(self):
        density, starts, ends = self._segs(R=2, S=4)
        w = render_weights(density, starts, ends)
        rgb = jnp.asarray(np.random.default_rng(5).uniform(size=(2, 4, 3)), jnp.float32)
        comp = np.asarray(render_rgb(rgb, w, background="black"))
        white = np.asarray(render_rgb(rgb, w, background="white"))
        acc = np.asarray(render_accumulation(w))
        np.testing.assert_allclose(white, comp + (1 - acc), rtol=1e-5)

    def test_depth_median_and_expected(self):
        # Single opaque sample at known depth.
        density = jnp.zeros((1, 8, 1)).at[0, 3, 0].set(1e5)
        starts = jnp.arange(8.0).reshape(1, 8, 1)
        ends = starts + 1.0
        w = render_weights(density, starts, ends)
        med = float(render_depth_median(w, starts, ends)[0, 0])
        exp = float(render_depth_expected(w, starts, ends)[0, 0])
        assert abs(med - 3.5) < 1e-4
        assert abs(exp - 3.5) < 1e-3

    def test_eval_clamps(self):
        density, starts, ends = self._segs(R=1, S=4)
        w = render_weights(density, starts, ends)
        thermal = jnp.full((1, 4, 1), 3.0)
        out = np.asarray(render_thermal(thermal, w, train=False))
        assert np.all(out <= 1.0)

    def test_packed_matches_dense(self):
        """The packed-samples path (nerfacc.accumulate_along_rays
        counterpart, rgbt_renderer.py:50-61) must agree with the dense
        composite when the packing is a flattened dense layout — including
        ragged packings (rays contributing different sample counts)."""
        from thermo_tpu.ops.rendering import (
            accumulate_packed,
            render_rgbt,
            render_rgbt_packed,
        )

        density, starts, ends = self._segs(R=3, S=6)
        w = render_weights(density, starts, ends)
        rgbt = jnp.asarray(
            np.random.default_rng(6).uniform(size=(3, 6, 4)), jnp.float32
        )
        dense = np.asarray(render_rgbt(rgbt, w, train=True))
        ray_idx = jnp.repeat(jnp.arange(3), 6)
        packed = np.asarray(
            render_rgbt_packed(
                rgbt.reshape(-1, 4), w.reshape(-1), ray_idx, num_rays=3
            )
        )
        np.testing.assert_allclose(packed, dense, rtol=1e-5, atol=1e-7)

        # ragged packing: drop ray 1's last two samples (weight 0 there)
        keep = np.ones((3, 6), bool)
        keep[1, 4:] = False
        w0 = np.asarray(w)[..., 0] * keep
        packed_ragged = np.asarray(
            accumulate_packed(
                jnp.asarray(w0.reshape(-1)[keep.reshape(-1)]),
                rgbt.reshape(-1, 4)[keep.reshape(-1)],
                jnp.asarray(np.repeat(np.arange(3), 6)[keep.reshape(-1)]),
                num_rays=3,
            )
        )
        dense_masked = np.sum(
            w0[..., None] * np.asarray(rgbt), axis=1
        )
        np.testing.assert_allclose(packed_ragged, dense_masked, rtol=1e-5, atol=1e-7)

    def test_packed_last_sample_raises(self):
        from thermo_tpu.ops.rendering import render_rgbt_packed

        with np.testing.assert_raises(NotImplementedError):
            render_rgbt_packed(
                jnp.zeros((4, 4)), jnp.zeros((4,)), jnp.zeros((4,), jnp.int32),
                num_rays=2, background="last_sample",
            )


class TestSamplers:
    def test_piecewise_spacing_roundtrip(self):
        t = jnp.asarray([0.05, 0.5, 1.0, 10.0, 1000.0])
        s = spacing_piecewise(t)
        np.testing.assert_allclose(np.asarray(spacing_piecewise_inv(s)), np.asarray(t), rtol=1e-4)

    def test_spaced_sampler_bounds(self):
        near = jnp.full((8, 1), 0.05)
        far = jnp.full((8, 1), 1000.0)
        seg = sample_spaced(jax.random.PRNGKey(0), near, far, 32, train=True)
        t = np.asarray(seg.tbins)
        assert t.shape == (8, 33)
        assert np.all(np.diff(t, axis=-1) >= 0)
        assert np.all(t >= 0.05 - 1e-5) and np.all(t <= 1000.0 + 1e-2)

    def test_spaced_sampler_eval_deterministic(self):
        near = jnp.full((4, 1), 0.05)
        far = jnp.full((4, 1), 100.0)
        a = sample_spaced(None, near, far, 16, train=False)
        b = sample_spaced(None, near, far, 16, train=False)
        np.testing.assert_array_equal(np.asarray(a.tbins), np.asarray(b.tbins))

    def test_pdf_concentrates_samples(self):
        # Weights peaked in one bin -> resampled bins cluster there.
        R, S = 4, 32
        near = jnp.full((R, 1), 1.0)
        far = jnp.full((R, 1), 2.0)
        seg = sample_spaced(None, near, far, S, spacing="uniform", train=False)
        w = np.full((R, S, 1), 1e-4, np.float32)
        w[:, 10, 0] = 10.0  # peak
        new = sample_pdf(
            jax.random.PRNGKey(1), seg, jnp.asarray(w), near, far, 16,
            spacing="uniform", train=True,
        )
        mids = np.asarray((new.tbins[:, 1:] + new.tbins[:, :-1]) / 2)
        peak_t = np.asarray((seg.tbins[:, 10] + seg.tbins[:, 11]) / 2)
        frac_near_peak = np.mean(np.abs(mids - peak_t[:, None]) < 0.1)
        assert frac_near_peak > 0.5

    def test_anneal_and_update_schedule(self):
        cfg = ProposalSamplerConfig()
        assert float(proposal_anneal(jnp.asarray(0.0), cfg)) == 0.0
        np.testing.assert_allclose(float(proposal_anneal(jnp.asarray(1000.0), cfg)), 1.0)
        np.testing.assert_allclose(float(proposal_update_schedule(jnp.asarray(0.0), cfg)), 1.0)
        np.testing.assert_allclose(
            float(proposal_update_schedule(jnp.asarray(5000.0), cfg)), 5.0
        )

    def test_proposal_sampler_end_to_end(self):
        cfg = ProposalSamplerConfig(
            num_nerf_samples_per_ray=8, num_proposal_samples_per_ray=(16, 12)
        )
        R = 8
        origins = jnp.zeros((R, 3))
        directions = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (R, 1)), jnp.float32)
        near = jnp.full((R, 1), 0.05)
        far = jnp.full((R, 1), 100.0)
        density_fns = [
            lambda p: jnp.ones((*p.shape[:-1], 1)) * 0.1,
            lambda p: jnp.ones((*p.shape[:-1], 1)) * 0.1,
        ]
        out = proposal_sample(
            jax.random.PRNGKey(2), density_fns, origins, directions, near, far, cfg,
            anneal=0.5, train=True,
        )
        assert out.final.tbins.shape == (R, 9)
        assert out.prop_segments[0].tbins.shape == (R, 17)
        assert out.prop_weights[1].shape == (R, 12, 1)
        assert np.all(np.diff(np.asarray(out.final.tbins), axis=-1) >= 0)


class TestLosses:
    def test_mse(self):
        np.testing.assert_allclose(
            float(mse(jnp.ones((4, 3)), jnp.zeros((4, 3)))), 1.0
        )

    def test_interlevel_zero_when_prop_covers(self):
        # If the proposal histogram has all its mass exactly where the final
        # has mass, the outer bound >= final weights -> zero loss.
        R, S = 2, 8
        bins = jnp.broadcast_to(jnp.linspace(0, 1, S + 1), (R, S + 1))
        w = jnp.full((R, S, 1), 1.0 / S)
        loss = interlevel_loss(bins, w, [bins], [w])
        np.testing.assert_allclose(float(loss), 0.0, atol=1e-6)

    def test_interlevel_positive_on_mismatch(self):
        R, S = 2, 8
        bins = jnp.broadcast_to(jnp.linspace(0, 1, S + 1), (R, S + 1))
        w_final = jnp.full((R, S, 1), 1.0 / S)
        w_prop = jnp.zeros((R, S, 1))  # proposal says "nothing anywhere"
        loss = interlevel_loss(bins, w_final, [bins], [w_prop])
        assert float(loss) > 0

    def test_distortion_decreases_with_concentration(self):
        R, S = 1, 16
        bins = jnp.broadcast_to(jnp.linspace(0, 1, S + 1), (R, S + 1))
        spread = jnp.full((R, S), 1.0 / S)
        concentrated = jnp.zeros((R, S)).at[:, 7].set(1.0)
        l_spread = float(jnp.mean(lossfun_distortion(bins, spread)))
        l_conc = float(jnp.mean(lossfun_distortion(bins, concentrated)))
        assert l_conc < l_spread

    def test_distortion_loss_api(self):
        R, S = 3, 8
        bins = jnp.broadcast_to(jnp.linspace(0, 1, S + 1), (R, S + 1))
        w = jnp.full((R, S, 1), 0.1)
        assert float(distortion_loss(bins, w)) > 0


class TestHashBackward:
    def test_scatter_add_via_sort_matches_scatter(self):
        from thermo_tpu.ops.hash_backward import scatter_add_via_sort

        rng = np.random.default_rng(0)
        M, R, F = 5000, 257, 2
        idx = jnp.asarray(rng.integers(0, R, M), jnp.int32)
        vals = jnp.asarray(rng.normal(size=(M, F)), jnp.float32)
        want = np.zeros((R, F), np.float32)
        np.add.at(want, np.asarray(idx), np.asarray(vals))
        got = np.asarray(scatter_add_via_sort(idx, vals, R))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_empty_rows_are_zero(self):
        from thermo_tpu.ops.hash_backward import scatter_add_via_sort

        idx = jnp.asarray([3, 3, 7], jnp.int32)
        vals = jnp.ones((3, 2), jnp.float32)
        out = np.asarray(scatter_add_via_sort(idx, vals, 10))
        assert out[3].tolist() == [2.0, 2.0]
        assert out[7].tolist() == [1.0, 1.0]
        assert np.abs(out).sum() == 6.0


class TestHashCustomVJP:
    def test_grads_match_xla_autodiff(self):
        """The custom scalar-scatter backward must match plain XLA autodiff
        of the forward exactly (both table and position grads)."""
        from thermo_tpu.ops.hash_encoding import _hash_forward

        spec = HashGridSpec(num_levels=3, base_res=4, max_res=16, log2_hashmap_size=9)
        table = init_hash_table(jax.random.PRNGKey(0), spec) * 1e3  # non-tiny
        p = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=0.01, maxval=0.99)
        g_out = jax.random.normal(jax.random.PRNGKey(2), (64, spec.out_dim))

        def loss_custom(t, pp):
            return jnp.vdot(hash_encode(t, pp, spec), g_out)

        def loss_ref(t, pp):
            return jnp.vdot(_hash_forward(t, pp, spec)[0], g_out)

        gt_c, gp_c = jax.grad(loss_custom, argnums=(0, 1))(table, p)
        gt_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(table, p)
        np.testing.assert_allclose(np.asarray(gt_c), np.asarray(gt_r), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gp_c), np.asarray(gp_r), rtol=1e-3, atol=1e-4)

    def test_position_grad_on_grid_plane(self):
        """Points exactly on a grid plane must not produce NaN/garbage grads
        (the division-free dw/dfrac path)."""
        spec = HashGridSpec(num_levels=1, base_res=4, max_res=4, log2_hashmap_size=8)
        table = init_hash_table(jax.random.PRNGKey(0), spec)
        # scaled = p*3 + 0.5 integer => frac = 0 exactly
        p = jnp.asarray([[0.5 / 3.0, 0.5, 0.5]])
        g = jax.grad(lambda pp: jnp.sum(hash_encode(table, pp, spec)))(p)
        assert np.all(np.isfinite(np.asarray(g)))


class TestStochasticCorners:
    """hash_grad_corners / fwd_corners: unbiased stochastic-trilinear modes."""

    def _setup(self):
        spec = HashGridSpec(num_levels=2, base_res=4, max_res=8, log2_hashmap_size=8)
        table = init_hash_table(jax.random.PRNGKey(0), spec) * 1e3
        p = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=0.01, maxval=0.99)
        return spec, table, p

    def test_grad_corners_unbiased(self):
        """With many sampled corners the stochastic table gradient converges
        to the exact one (law of large numbers on the Categorical(w) draws)."""
        spec, table, p = self._setup()
        g_out = jax.random.normal(jax.random.PRNGKey(2), (32, spec.out_dim))

        def loss(t, k):
            return jnp.vdot(hash_encode(t, p, spec, grad_corners=k), g_out)

        g_exact = np.asarray(jax.grad(lambda t: loss(t, 0))(table))
        g_stoch = np.asarray(jax.grad(lambda t: loss(t, 2048))(table))
        scale = np.abs(g_exact).max()
        np.testing.assert_allclose(g_stoch, g_exact, atol=0.1 * scale)

    def test_grad_corners_position_grad_unbiased(self):
        """grad_corners>0 estimates position gradients from the sampled
        corners (importance-weighted); with many draws it converges to the
        exact trilinear gradient (up to the documented w>=1/64 clamp)."""
        spec, table, p = self._setup()

        def loss(pp, k):
            return jnp.sum(hash_encode(table, pp, spec, grad_corners=k) ** 2)

        gp_exact = np.asarray(jax.grad(lambda pp: loss(pp, 0))(p))
        gp_stoch = np.asarray(jax.grad(lambda pp: loss(pp, 4096))(p))
        scale = np.abs(gp_exact).max()
        np.testing.assert_allclose(gp_stoch, gp_exact, atol=0.15 * scale)

    def test_grad_corners_hits_subset_of_exact_rows(self):
        """k=2 sampled-corner gradients only touch rows the exact gradient
        touches, with total mass preserved per (level, feature)."""
        spec, table, p = self._setup()
        g_out = jnp.ones((32, spec.out_dim))

        def loss(t, k):
            return jnp.vdot(hash_encode(t, p, spec, grad_corners=k), g_out)

        g_exact = np.asarray(jax.grad(lambda t: loss(t, 0))(table))
        g_stoch = np.asarray(jax.grad(lambda t: loss(t, 2))(table))
        assert np.all((g_stoch != 0) <= (g_exact != 0))
        # trilinear weights sum to 1 => per-level total gradient mass matches
        np.testing.assert_allclose(
            g_stoch.sum(axis=1), g_exact.sum(axis=1), rtol=1e-4, atol=1e-5
        )

    def test_fwd_corners_unbiased_output(self):
        """Stochastic-trilinear forward converges to exact trilinear as the
        number of sampled corners grows."""
        spec, table, p = self._setup()
        exact = np.asarray(hash_encode(table, p, spec))
        approx = np.asarray(hash_encode(table, p, spec, fwd_corners=4096))
        scale = np.abs(exact).max()
        np.testing.assert_allclose(approx, exact, atol=0.1 * scale)

    def test_fwd_corners_table_grad_unbiased(self):
        spec, table, p = self._setup()
        g_out = jax.random.normal(jax.random.PRNGKey(3), (32, spec.out_dim))

        def loss(t, fc):
            return jnp.vdot(hash_encode(t, p, spec, fwd_corners=fc), g_out)

        g_exact = np.asarray(jax.grad(lambda t: loss(t, 0))(table))
        g_stoch = np.asarray(jax.grad(lambda t: loss(t, 4096))(table))
        scale = np.abs(g_exact).max()
        np.testing.assert_allclose(g_stoch, g_exact, atol=0.1 * scale)

    def test_fwd_corners_zero_position_grad(self):
        """fwd_corners mode stops position gradients (documented)."""
        spec, table, p = self._setup()
        gp = jax.grad(
            lambda pp: jnp.sum(hash_encode(table, pp, spec, fwd_corners=2))
        )(p)
        assert float(jnp.abs(gp).max()) == 0.0

    def test_grad_levels_unbiased_in_aggregate(self):
        """grad_levels=1 (of L=2) scatters each point's table grad into one
        uniformly-drawn level scaled x2. Per point this is a subset of the
        exact rows; aggregated over many points the per-level gradient mass
        matches the exact gradient (unbiasedness, law of large numbers over
        the independent per-point level draws)."""
        spec = HashGridSpec(num_levels=2, base_res=4, max_res=8, log2_hashmap_size=8)
        table = init_hash_table(jax.random.PRNGKey(0), spec) * 1e3
        p = jax.random.uniform(
            jax.random.PRNGKey(1), (4096, 3), minval=0.01, maxval=0.99
        )
        g_out = jnp.ones((4096, spec.out_dim))

        def loss(t, **kw):
            return jnp.vdot(hash_encode(t, p, spec, **kw), g_out)

        g_exact = np.asarray(
            jax.grad(lambda t: loss(t, grad_corners=64))(table)
        )
        g_stoch = np.asarray(
            jax.grad(lambda t: loss(t, grad_corners=64, grad_levels=1))(table)
        )
        assert np.all((g_stoch != 0) <= (g_exact != 0))
        # per-level aggregated mass approximately preserved (E exact)
        np.testing.assert_allclose(
            g_stoch.reshape(g_stoch.shape[0], 2, -1).sum(axis=(0, 2)),
            g_exact.reshape(g_exact.shape[0], 2, -1).sum(axis=(0, 2)),
            rtol=0.1,
        )

    def test_grad_levels_in_stoch_fwd_mode(self):
        """grad_levels composes with fwd_corners: same subset/mass property."""
        spec = HashGridSpec(num_levels=2, base_res=4, max_res=8, log2_hashmap_size=8)
        table = init_hash_table(jax.random.PRNGKey(0), spec) * 1e3
        p = jax.random.uniform(
            jax.random.PRNGKey(1), (4096, 3), minval=0.01, maxval=0.99
        )
        g_out = jnp.ones((4096, spec.out_dim))

        def loss(t, **kw):
            return jnp.vdot(hash_encode(t, p, spec, **kw), g_out)

        g_full = np.asarray(
            jax.grad(lambda t: loss(t, fwd_corners=2))(table)
        )
        g_sub = np.asarray(
            jax.grad(lambda t: loss(t, fwd_corners=2, grad_levels=1))(table)
        )
        assert np.all((g_sub != 0) <= (g_full != 0))
        np.testing.assert_allclose(
            g_sub.reshape(g_sub.shape[0], 2, -1).sum(axis=(0, 2)),
            g_full.reshape(g_full.shape[0], 2, -1).sum(axis=(0, 2)),
            rtol=0.1,
        )

    def test_model_forward_with_tpu_knobs(self):
        """Full model forward/backward runs with both knobs enabled."""
        from thermo_tpu.models.thermal_nerf import (
            ModelConfig,
            ProposalNetArgs,
            ThermoNerfModel,
        )
        from thermo_tpu.data.cameras import RayBundle

        cfg = ModelConfig(
            num_levels=2,
            max_res=32,
            log2_hashmap_size=8,
            num_proposal_samples_per_ray=(8, 4),
            num_nerf_samples_per_ray=4,
            proposal_net_args_list=(
                ProposalNetArgs(num_levels=2, max_res=16, log2_hashmap_size=7, hidden_dim=8),
            )
            * 2,
            far_plane=4.0,
            compute_dtype="float32",
            hash_grad_corners=2,
            proposal_fwd_corners=2,
        )
        model = ThermoNerfModel(cfg, ((-1.0,) * 3, (1.0,) * 3), num_train_images=2)
        params = model.init_params(jax.random.PRNGKey(0))
        d = np.random.default_rng(0).normal(size=(8, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = RayBundle(
            origins=jnp.zeros((8, 3)),
            directions=jnp.asarray(d, jnp.float32),
            camera_indices=jnp.zeros((8,), jnp.int32),
        )

        def loss_fn(prm):
            out = model.forward(prm, rays, jax.random.PRNGKey(1), step=100.0)
            total, _ = model.losses(
                prm, out, jnp.ones((8, 3)) * 0.5, jnp.ones((8, 1)) * 0.5
            )
            return total

        val, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(val))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
        # the shared field table must receive gradient in stochastic mode
        ftab = grads["fields"]["grid"]["table"]
        assert float(jnp.abs(ftab).sum()) > 0.0

    def test_final_field_fwd_corners_trains_and_evals_exact(self):
        """hash_fwd_corners on the FINAL field: training still produces
        finite grads with a nonzero table gradient, and the eval forward
        (train=False) is bit-identical to an exact-config model (the
        stochastic estimators are training-only)."""
        import dataclasses

        from thermo_tpu.data.cameras import RayBundle
        from thermo_tpu.models.thermal_nerf import (
            ModelConfig,
            ProposalNetArgs,
            ThermoNerfModel,
        )

        base = ModelConfig(
            num_levels=2,
            max_res=32,
            log2_hashmap_size=8,
            num_proposal_samples_per_ray=(8, 4),
            num_nerf_samples_per_ray=4,
            proposal_net_args_list=(
                ProposalNetArgs(num_levels=2, max_res=16, log2_hashmap_size=7, hidden_dim=8),
            )
            * 2,
            far_plane=4.0,
            compute_dtype="float32",
        )
        cfg = dataclasses.replace(base, hash_fwd_corners=2)
        model = ThermoNerfModel(cfg, ((-1.0,) * 3, (1.0,) * 3), num_train_images=2)
        exact = ThermoNerfModel(base, ((-1.0,) * 3, (1.0,) * 3), num_train_images=2)
        params = model.init_params(jax.random.PRNGKey(0))
        d = np.random.default_rng(0).normal(size=(8, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = RayBundle(
            origins=jnp.zeros((8, 3)),
            directions=jnp.asarray(d, jnp.float32),
            camera_indices=jnp.zeros((8,), jnp.int32),
        )

        def loss_fn(prm):
            out = model.forward(prm, rays, jax.random.PRNGKey(1), step=100.0)
            total, _ = model.losses(
                prm, out, jnp.ones((8, 3)) * 0.5, jnp.ones((8, 1)) * 0.5
            )
            return total

        val, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(val))
        assert float(jnp.abs(grads["fields"]["grid"]["table"]).sum()) > 0.0

        out_s = model.forward(params, rays, None, step=100.0, train=False)
        out_e = exact.forward(params, rays, None, step=100.0, train=False)
        np.testing.assert_array_equal(
            np.asarray(out_s["rgb"]), np.asarray(out_e["rgb"])
        )
        np.testing.assert_array_equal(
            np.asarray(out_s["thermal"]), np.asarray(out_e["thermal"])
        )

    def test_density_field_grads_flow_through_fwd_corners(self):
        """HashMLPDensityField with stochastic-trilinear forward still
        trains: table and MLP receive nonzero gradients."""
        from thermo_tpu.models.field import HashMLPDensityField

        net = HashMLPDensityField(
            aabb=((-1.0,) * 3, (1.0,) * 3),
            num_levels=2,
            max_res=16,
            log2_hashmap_size=7,
            hidden_dim=8,
            fwd_corners=2,
            compute_dtype=jnp.float32,
        )
        p = jax.random.uniform(
            jax.random.PRNGKey(0), (16, 3), minval=-0.5, maxval=0.5
        )
        v = net.init(jax.random.PRNGKey(1), p)
        g = jax.grad(lambda prm: jnp.sum(net.apply({"params": prm}, p)))(
            v["params"]
        )
        sums = jax.tree_util.tree_map(lambda x: float(jnp.abs(x).sum()), g)
        assert sums["HashEncoding_0"]["table"] > 0.0
        assert sums["MLP_0"]["dense_0"]["bias"] > 0.0


class TestLowRank:
    """CP-factorized two-hot matmul encoding (ops/lowrank.py) — the
    TPU-native proposal-field encoding (scatter/gather-free)."""

    def test_cp_encode_matches_direct_interp(self):
        from thermo_tpu.ops.lowrank import cp_encode

        R, K, N = 17, 5, 203
        lines = jax.random.normal(jax.random.PRNGKey(0), (3, R, K))
        p = jax.random.uniform(jax.random.PRNGKey(1), (N, 3))

        def ref_line(ln, c):
            i0 = np.clip(np.floor(c), 0, R - 2).astype(int)
            fr = c - i0
            return ln[i0] * (1 - fr[:, None]) + ln[i0 + 1] * fr[:, None]

        c = np.asarray(p) * (R - 1)
        ref = (
            ref_line(np.asarray(lines[0]), c[:, 0])
            * ref_line(np.asarray(lines[1]), c[:, 1])
            * ref_line(np.asarray(lines[2]), c[:, 2])
        )
        out = np.asarray(cp_encode(lines, p))
        # bf16 matmul accumulation tolerance
        np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)

    def test_cp_encode_gradients_finite_and_nonzero(self):
        from thermo_tpu.ops.lowrank import cp_encode, init_cp_lines

        lines = init_cp_lines(jax.random.PRNGKey(0), 33, 8)
        p = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
        gl = jax.grad(lambda l: jnp.sum(cp_encode(l, p) ** 2))(lines)
        gp = jax.grad(lambda q: jnp.sum(cp_encode(lines, q) ** 2))(p)
        for g in (gl, gp):
            a = np.asarray(g)
            assert np.all(np.isfinite(a)) and np.abs(a).max() > 0

    def test_cp_density_field_trains(self):
        from thermo_tpu.models.field import CPDensityField

        net = CPDensityField(
            aabb=((-1.0,) * 3, (1.0,) * 3), resolution=16, rank=4,
            hidden_dim=8, compute_dtype=jnp.float32,
        )
        p = jax.random.uniform(
            jax.random.PRNGKey(0), (16, 3), minval=-0.5, maxval=0.5
        )
        v = net.init(jax.random.PRNGKey(1), p)
        d = net.apply({"params": v["params"]}, p)
        assert d.shape == (16, 1) and np.all(np.asarray(d) >= 0)
        g = jax.grad(lambda prm: jnp.sum(net.apply({"params": prm}, p)))(
            v["params"]
        )
        sums = jax.tree_util.tree_map(lambda x: float(jnp.abs(x).sum()), g)
        assert sums["lines"] > 0.0
        assert sums["MLP_0"]["dense_0"]["kernel"] > 0.0


class TestRowScatterBranch:
    """F>=8 tables scatter whole rows instead of folded scalars (a v5e perf
    choice); both branches must produce identical table gradients."""

    def _grads(self, min_f, **kw):
        import thermo_tpu.ops.hash_encoding as he

        spec = HashGridSpec(
            num_levels=2, base_res=4, max_res=8, log2_hashmap_size=8,
            features_per_level=8,
        )
        table = init_hash_table(jax.random.PRNGKey(0), spec) * 1e3
        p = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=0.01, maxval=0.99)
        g_out = jnp.ones((64, spec.out_dim))
        old = he._ROW_SCATTER_MIN_F
        he._ROW_SCATTER_MIN_F = min_f
        try:
            return np.asarray(
                jax.grad(
                    lambda t: jnp.vdot(hash_encode(t, p, spec, **kw), g_out)
                )(table)
            )
        finally:
            he._ROW_SCATTER_MIN_F = old

    def test_fused_scatter_row_equals_scalar(self):
        np.testing.assert_allclose(
            self._grads(8, grad_corners=2),
            self._grads(999, grad_corners=2),
            rtol=1e-6,
        )

    def test_level_subsampled_row_equals_scalar(self):
        np.testing.assert_allclose(
            self._grads(8, grad_corners=2, grad_levels=1),
            self._grads(999, grad_corners=2, grad_levels=1),
            rtol=1e-6,
        )

    def test_stoch_fwd_row_equals_scalar(self):
        np.testing.assert_allclose(
            self._grads(8, fwd_corners=1, grad_levels=1),
            self._grads(999, fwd_corners=1, grad_levels=1),
            rtol=1e-6,
        )
