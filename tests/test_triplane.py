"""Triplane (K-planes) encoding tests: matmul evaluation vs a naive
4-corner-gather bilinear reference, gradients, chunking, and the proposal
density field built on it (round-4 quality lever, ops/triplane.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from thermo_tpu.ops.triplane import (
    _CHUNK,
    _PLANE_AXES,
    init_triplanes,
    triplane_encode,
)


def _naive_triplane(planes, positions):
    """Straightforward 4-corner bilinear per plane, Hadamard product."""
    planes = np.asarray(planes, np.float64)
    p = np.asarray(positions, np.float64)
    r = planes.shape[1]
    coords = np.clip(p, 0.0, 1.0) * (r - 1)
    out = np.ones((p.shape[0], planes.shape[3]))
    for pi, (a, b) in enumerate(_PLANE_AXES):
        ca, cb = coords[:, a], coords[:, b]
        ia = np.clip(np.floor(ca), 0, r - 2).astype(int)
        ib = np.clip(np.floor(cb), 0, r - 2).astype(int)
        fa, fb = ca - ia, cb - ib
        P = planes[pi]  # [Ra, Rb, K]
        f = (
            P[ia, ib] * ((1 - fa) * (1 - fb))[:, None]
            + P[ia + 1, ib] * (fa * (1 - fb))[:, None]
            + P[ia, ib + 1] * ((1 - fa) * fb)[:, None]
            + P[ia + 1, ib + 1] * (fa * fb)[:, None]
        )
        out = out * f
    return out


class TestTriplaneEncode:
    def test_matches_naive_bilinear(self):
        key = jax.random.PRNGKey(0)
        planes = init_triplanes(key, resolution=17, rank=5)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (257, 3))
        got = np.asarray(triplane_encode(planes, pos))
        want = _naive_triplane(planes, pos)
        # bf16 two-hot weights + f32 accumulation: ~3 bf16 roundings per factor
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)

    def test_exact_on_grid_points(self):
        """At integer grid coordinates the two-hot is exact (frac=0), so the
        only rounding left is the bf16 cast of the plane VALUES feeding the
        MXU — compare against the naive reference on bf16-pre-rounded
        planes, which must then match to f32 accumulation precision."""
        key = jax.random.PRNGKey(2)
        r = 9
        planes = init_triplanes(key, resolution=r, rank=3)
        planes_bf16 = jnp.asarray(planes, jnp.bfloat16).astype(jnp.float32)
        idx = np.stack(np.meshgrid(*[np.arange(r - 1)] * 3, indexing="ij"), -1)
        pos = (idx.reshape(-1, 3) / (r - 1)).astype(np.float32)
        got = np.asarray(triplane_encode(planes, pos))
        want = _naive_triplane(planes_bf16, pos)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_batch_shape_preserved(self):
        planes = init_triplanes(jax.random.PRNGKey(0), 9, 4)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (4, 7, 3))
        assert triplane_encode(planes, pos).shape == (4, 7, 4)

    def test_chunked_matches_unchunked(self, monkeypatch):
        import thermo_tpu.ops.triplane as tp

        planes = init_triplanes(jax.random.PRNGKey(0), 9, 4)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (1000, 3))
        full = np.asarray(tp.triplane_encode(planes, pos))
        monkeypatch.setattr(tp, "_CHUNK", 256)
        chunked = np.asarray(tp.triplane_encode(planes, pos))
        np.testing.assert_allclose(full, chunked, rtol=1e-6, atol=1e-6)

    def test_plane_gradients_flow_and_match_fd(self):
        """Parameter gradient (the matmul backward) vs finite differences."""
        planes = init_triplanes(jax.random.PRNGKey(0), 7, 2)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (31, 3))
        g_out = jax.random.normal(jax.random.PRNGKey(2), (31, 2))

        def loss(pl):
            return jnp.sum(triplane_encode(pl, pos) * g_out)

        g = np.asarray(jax.grad(loss)(planes))
        assert np.all(np.isfinite(g)) and np.abs(g).sum() > 0
        rng = np.random.default_rng(0)
        # the output is LINEAR in each single plane entry, so a large eps is
        # exact — and eps must exceed bf16 resolution (~0.008 near 1.0) or
        # the perturbation rounds away inside the matmul cast
        eps = 0.25
        for _ in range(5):
            i = tuple(rng.integers(0, s) for s in planes.shape)
            e = np.zeros(planes.shape, np.float32)
            e[i] = eps
            fd = (float(loss(planes + e)) - float(loss(planes - e))) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=0.05, atol=5e-3)

    def test_position_gradients_nonzero(self):
        """Camera-pose gradients need d(features)/d(positions) — the two-hot
        weights are differentiable in the fractional coordinate."""
        planes = init_triplanes(jax.random.PRNGKey(0), 9, 4)
        pos = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=0.1, maxval=0.9)

        g = jax.grad(lambda p: jnp.sum(triplane_encode(planes, p)))(pos)
        g = np.asarray(g)
        assert np.all(np.isfinite(g))
        assert np.abs(g).sum() > 0

    def test_radial_bump_is_representable(self):
        """The CP-killer case: a separable rank cannot localize a radial
        bump well, but a triplane product represents exp(-a r^2) EXACTLY at
        rank 1 — fit check with closed-form planes."""
        r, a = 17, 8.0
        ax = np.linspace(0, 1, r) - 0.5
        pairwise = np.exp(
            -a * (ax[:, None] ** 2 + ax[None, :] ** 2) / 2.0
        )  # exp(-a(u^2+v^2)/2)
        planes = jnp.asarray(
            np.stack([pairwise] * 3)[..., None], jnp.float32
        )  # [3, R, R, 1]
        pos = jax.random.uniform(jax.random.PRNGKey(3), (200, 3))
        got = np.asarray(triplane_encode(planes, pos))[:, 0]
        p = np.asarray(pos) - 0.5
        want = np.exp(-a * np.sum(p * p, -1))
        # bilinear discretization + bf16; correlation is the claim
        assert np.corrcoef(got, want)[0, 1] > 0.99


class TestTriplaneDensityField:
    def test_field_forward_and_grads(self):
        from thermo_tpu.models.field import TriplaneDensityField

        f = TriplaneDensityField(
            aabb=((-1.0,) * 3, (1.0,) * 3), resolution=9, rank=4,
            hidden_dim=8, compute_dtype=jnp.float32,
        )
        pos = jax.random.normal(jax.random.PRNGKey(0), (33, 3)) * 0.4
        params = f.init(jax.random.PRNGKey(1), pos)["params"]
        d = f.apply({"params": params}, pos)
        assert d.shape == (33, 1)
        assert np.all(np.asarray(d) >= 0)

        g = jax.grad(
            lambda p: jnp.sum(f.apply({"params": p}, pos))
        )(params)
        total = jax.tree_util.tree_reduce(
            lambda acc, leaf: acc + float(jnp.sum(jnp.abs(leaf))), g, 0.0
        )
        assert np.isfinite(total) and total > 0

    def test_model_builds_with_triplane_proposals(self):
        from thermo_tpu.models.thermal_nerf import (
            ModelConfig,
            ProposalNetArgs,
            ThermoNerfModel,
        )
        from tests.test_model import TINY, AABB, _rays

        cfg = ModelConfig(
            mode="thermal",
            **{
                **TINY,
                "proposal_net_args_list": (
                    ProposalNetArgs(kind="triplane", max_res=17, rank=4, hidden_dim=8),
                    ProposalNetArgs(kind="triplane", max_res=33, rank=4, hidden_dim=8),
                ),
            },
        )
        m = ThermoNerfModel(cfg, AABB, num_train_images=4)
        params = m.init_params(jax.random.PRNGKey(0))
        assert "planes" in params["proposal_networks"]["0"]
        out = m.forward(params, _rays(), jax.random.PRNGKey(1), train=True)
        assert np.all(np.isfinite(np.asarray(out["rgb"])))

        def loss(p):
            o = m.forward(p, _rays(), jax.random.PRNGKey(1), train=True)
            total, _ = m.losses(
                p, o, jnp.zeros((16, 3)), jnp.zeros((16, 1)),
                rng=jax.random.PRNGKey(2),
            )
            return total

        g = jax.grad(loss)(params)
        tot = jax.tree_util.tree_reduce(
            lambda acc, leaf: acc + float(jnp.sum(jnp.abs(leaf))),
            g["proposal_networks"], 0.0,
        )
        assert np.isfinite(tot) and tot > 0
