"""Model-level tests: field forward, full model forward, gradient flow into
the shared hash grid from BOTH modalities (the core ThermoNeRF claim —
thermal_field.py:171-173 / thermal_nerf_model.py:55-56)."""

import numpy as np
import jax
import jax.numpy as jnp

from thermo_tpu.data.cameras import RayBundle
from thermo_tpu.models.thermal_nerf import ModelConfig, ThermoNerfModel

TINY = dict(
    num_levels=4,
    max_res=64,
    log2_hashmap_size=10,
    hidden_dim=16,
    hidden_dim_color=16,
    hidden_dim_transient=16,
    num_proposal_samples_per_ray=(12, 8),
    num_nerf_samples_per_ray=6,
    proposal_net_args_list=(
        __import__("thermo_tpu.models.thermal_nerf", fromlist=["ProposalNetArgs"]).ProposalNetArgs(
            num_levels=2, max_res=32, log2_hashmap_size=8, hidden_dim=8
        ),
    ) * 2,
    appearance_embed_dim=8,
    compute_dtype="float32",
)

AABB = ((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0))


def _rays(n=16, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return RayBundle(
        origins=jnp.asarray(rng.uniform(-0.5, 0.5, size=(n, 3)), jnp.float32),
        directions=jnp.asarray(d, jnp.float32),
        camera_indices=jnp.asarray(rng.integers(0, 4, size=(n,)), jnp.int32),
    )


def _model(mode="thermal", **kw):
    cfg = ModelConfig(mode=mode, **{**TINY, **kw})
    return ThermoNerfModel(cfg, AABB, num_train_images=4)


class TestModelForward:
    def test_param_groups(self):
        m = _model()
        params = m.init_params(jax.random.PRNGKey(0))
        assert set(params) == {"fields", "proposal_networks", "camera_opt"}
        assert set(params["proposal_networks"]) == {"0", "1"}
        assert params["camera_opt"].shape == (4, 6)

    def test_forward_shapes_thermal(self):
        m = _model()
        params = m.init_params(jax.random.PRNGKey(0))
        rays = _rays()
        out = m.forward(params, rays, jax.random.PRNGKey(1), step=100.0, train=True)
        assert out["rgb"].shape == (16, 3)
        assert out["thermal"].shape == (16, 1)
        assert out["depth"].shape == (16, 1)
        assert out["accumulation"].shape == (16, 1)
        assert "prop_depth_0" in out and "prop_depth_1" in out
        assert "_aux" in out

    def test_forward_shapes_concat(self):
        m = _model(mode="concat")
        params = m.init_params(jax.random.PRNGKey(0))
        out = m.forward(params, _rays(), jax.random.PRNGKey(1), train=True)
        assert out["rgb"].shape == (16, 4)
        assert out["thermal"].shape == (16, 1)

    def test_forward_shapes_rgb(self):
        m = _model(mode="rgb")
        params = m.init_params(jax.random.PRNGKey(0))
        out = m.forward(params, _rays(), jax.random.PRNGKey(1), train=True)
        assert out["rgb"].shape == (16, 3)
        assert "thermal" not in out

    def test_eval_outputs_clamped(self):
        m = _model()
        params = m.init_params(jax.random.PRNGKey(0))
        out = m.forward(params, _rays(), None, train=False)
        assert "_aux" not in out
        for k in ("rgb", "thermal"):
            v = np.asarray(out[k])
            assert np.all(v >= 0.0) and np.all(v <= 1.0)


class TestGradients:
    def _loss_grads(self, mode="thermal", pass_thermal=True):
        m = _model(mode=mode, pass_thermal_gradients=pass_thermal)
        params = m.init_params(jax.random.PRNGKey(0))
        rays = _rays()
        gt_rgb = jnp.zeros((16, 4 if mode == "concat" else 3))
        gt_thermal = jnp.zeros((16, 1))

        def loss_fn(p):
            out = m.forward(p, rays, jax.random.PRNGKey(1), step=2000.0, train=True)
            total, _ = m.losses(p, out, gt_rgb, gt_thermal, rng=jax.random.PRNGKey(2))
            return total

        return m, jax.grad(loss_fn)(params)

    def test_thermal_gradients_reach_shared_grid(self):
        """Thermal-only loss must still move the shared hash grid when
        pass_thermal_gradients=True."""
        m = _model()
        params = m.init_params(jax.random.PRNGKey(0))
        rays = _rays()
        gt_thermal = jnp.full((16, 1), 0.7)

        def thermal_only_loss(p):
            out = m.forward(p, rays, jax.random.PRNGKey(1), train=True)
            return jnp.mean((out["thermal"] - gt_thermal) ** 2)

        g = jax.grad(thermal_only_loss)(params)
        grid_grad = g["fields"]["grid"]["table"]
        assert float(jnp.sum(jnp.abs(grid_grad))) > 0.0

    def test_thermal_gradients_blocked_when_disabled(self):
        """pass_thermal_gradients=False must stop thermal->geometry gradients
        (thermal_field.py:172-173): the grid only sees thermal gradients
        through the density/weights path, which we isolate by freezing
        weights via the rgb head check: thermal MLP params still get grads,
        but geo_feat input is detached."""
        m = _model(pass_thermal_gradients=False)
        params = m.init_params(jax.random.PRNGKey(0))
        rays = _rays()

        def loss_fn(p):
            out = m.forward(p, rays, jax.random.PRNGKey(1), train=True)
            # isolate the head path: sum of raw thermal output
            return jnp.sum(out["thermal"])

        g = jax.grad(loss_fn)(params)
        # Thermal MLP itself still receives gradients...
        t_grad = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b))),
            g["fields"]["mlp_thermal"],
            0.0,
        )
        assert t_grad > 0.0

    def test_full_loss_grads_all_groups(self):
        _, g = self._loss_grads()
        for group in ("fields", "proposal_networks"):
            total = jax.tree_util.tree_reduce(
                lambda a, b: a + float(jnp.sum(jnp.abs(b))), g[group], 0.0
            )
            assert total > 0.0, group

    def test_concat_camera_opt_regularized(self):
        m, g = self._loss_grads(mode="concat")
        # the regularizer grad of zeros-init pose adjustment is 0 (norm at 0),
        # but the ray-bending path must produce finite grads
        assert np.all(np.isfinite(np.asarray(g["camera_opt"])))

    def test_losses_dict_contents(self):
        m = _model()
        params = m.init_params(jax.random.PRNGKey(0))
        out = m.forward(params, _rays(), jax.random.PRNGKey(1), train=True)
        total, metrics = m.losses(
            params, out, jnp.zeros((16, 3)), jnp.zeros((16, 1)),
            rng=jax.random.PRNGKey(2),
        )
        assert np.isfinite(float(total))
        for k in ("rgb_loss", "interlevel_loss", "distortion_loss", "thermal", "psnr"):
            assert k in metrics, k

    def _loss_metrics(self, mode):
        m = _model(mode=mode)
        params = m.init_params(jax.random.PRNGKey(0))
        out = m.forward(params, _rays(), jax.random.PRNGKey(1), train=True)
        gt = jnp.zeros((16, 4 if mode == "concat" else 3))
        return m.losses(params, out, gt, jnp.zeros((16, 1)), rng=jax.random.PRNGKey(2))

    def test_camera_opt_loss_per_mode(self):
        """Reference semantics: ThermalNerfModel's get_loss_dict override
        omits the camera-opt regularizer (thermal_nerf_model.py:277-326);
        ConcatNerfModel adds it (concat_nerfacto_model.py:232); rgb mode
        (ThermalNerfactoModel) inherits NerfactoModel's get_loss_dict, which
        also adds it (nerfstudio 1.1.5)."""
        _, thermal = self._loss_metrics("thermal")
        _, rgb = self._loss_metrics("rgb")
        _, concat = self._loss_metrics("concat")
        assert "camera_opt_regularizer" not in thermal
        assert "camera_opt_regularizer" in rgb
        assert "camera_opt_regularizer" in concat

    def test_camera_opt_metrics_all_modes(self):
        """get_metrics_dict is inherited from NerfactoModel in every mode
        (it calls camera_optimizer.get_metrics_dict), so translation/rotation
        magnitudes are logged for thermal too."""
        for mode in ("thermal", "rgb", "concat"):
            _, metrics = self._loss_metrics(mode)
            assert "camera_opt_translation" in metrics, mode
            assert "camera_opt_rotation" in metrics, mode
            assert np.isfinite(float(metrics["camera_opt_translation"]))

    def test_camera_opt_off_no_entries(self):
        m = _model(mode="rgb", camera_optimizer_mode="off")
        params = m.init_params(jax.random.PRNGKey(0))
        out = m.forward(params, _rays(), jax.random.PRNGKey(1), train=True)
        _, metrics = m.losses(
            params, out, jnp.zeros((16, 3)), None, rng=jax.random.PRNGKey(2)
        )
        assert "camera_opt_regularizer" not in metrics
        assert "camera_opt_translation" not in metrics


class TestOptionalBranches:
    def test_predict_normals_outputs_and_losses(self):
        m = _model(predict_normals=True)
        params = m.init_params(jax.random.PRNGKey(0))
        out = m.forward(params, _rays(), jax.random.PRNGKey(1), train=True)
        assert out["normals"].shape == (16, 3)
        assert out["pred_normals"].shape == (16, 3)
        assert out["rendered_orientation_loss"].shape == (16,)
        total, metrics = m.losses(
            params, out, jnp.zeros((16, 3)), jnp.zeros((16, 1)),
            rng=jax.random.PRNGKey(2),
        )
        assert "orientation_loss" in metrics and "pred_normal_loss" in metrics
        assert np.isfinite(float(total))

    def test_transient_embedding_branch(self):
        m = _model(use_transient_embedding=True)
        params = m.init_params(jax.random.PRNGKey(0))
        assert "embedding_transient" in params["fields"]
        out = m.forward(params, _rays(), jax.random.PRNGKey(1), train=True)
        # transient outputs exist on the field but are not rendered (parity
        # with the reference, which never consumes TRANSIENT_*)
        assert "rgb" in out and "thermal" in out


class TestProposalUpdateGating:
    def test_flag_zero_blocks_proposal_grads(self):
        """prop_grad_flag=0 (non-update step) must produce exactly zero
        gradients for the proposal networks and identical forward outputs."""
        m = _model()
        params = m.init_params(jax.random.PRNGKey(0))
        rays = _rays()

        def loss(p, flag):
            out = m.forward(
                p, rays, jax.random.PRNGKey(1), step=2000.0,
                prop_grad_flag=flag, train=True,
            )
            total, _ = m.losses(
                p, out, jnp.zeros((16, 3)), jnp.zeros((16, 1)),
                rng=jax.random.PRNGKey(2),
            )
            return total

        flag0 = jnp.asarray(0.0)
        flag1 = jnp.asarray(1.0)
        np.testing.assert_allclose(
            float(loss(params, flag0)), float(loss(params, flag1)), rtol=1e-6
        )
        g0 = jax.grad(loss)(params, flag0)
        g1 = jax.grad(loss)(params, flag1)
        z = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b))),
            g0["proposal_networks"], 0.0,
        )
        nz = jax.tree_util.tree_reduce(
            lambda a, b: a + float(jnp.sum(jnp.abs(b))),
            g1["proposal_networks"], 0.0,
        )
        assert z == 0.0
        assert nz > 0.0
        # field gradients unaffected by the gate
        f0 = np.asarray(g0["fields"]["grid"]["table"])
        f1 = np.asarray(g1["fields"]["grid"]["table"])
        np.testing.assert_allclose(f0, f1, rtol=1e-5, atol=1e-8)


class TestTpuPreset:
    """thermal-nerf-tpu: CP proposal fields + wide-feature hash grid +
    one-corner stochastic table gradients (configs/methods.py)."""

    def test_cp_proposal_model_trains_and_evals(self):
        import dataclasses

        from thermo_tpu.configs.methods import thermal_nerf_tpu_config
        from thermo_tpu.data.cameras import RayBundle
        from thermo_tpu.models.thermal_nerf import ThermoNerfModel

        cfg = thermal_nerf_tpu_config().model
        cfg = dataclasses.replace(
            cfg,
            num_proposal_samples_per_ray=(16, 8),
            num_nerf_samples_per_ray=4,
            log2_hashmap_size=10,
            max_res=64,
            proposal_net_args_list=tuple(
                dataclasses.replace(a, max_res=16, rank=4)
                for a in cfg.proposal_net_args_list
            ),
            compute_dtype="float32",
        )
        model = ThermoNerfModel(cfg, ((-1.0,) * 3, (1.0,) * 3), 4)
        params = model.init_params(jax.random.PRNGKey(0))
        rng = np.random.default_rng(0)
        n = 32
        d = rng.normal(size=(n, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = RayBundle(
            jnp.asarray(rng.uniform(-0.5, 0.5, (n, 3)), jnp.float32),
            jnp.asarray(d, jnp.float32),
            jnp.asarray(rng.integers(0, 4, n), jnp.int32),
        )

        def loss(p):
            out = model.forward(
                p, rays, jax.random.PRNGKey(1), step=100.0,
                prop_grad_flag=1.0, train=True,
            )
            total, _ = model.losses(
                p, out, jnp.full((n, 3), 0.5), jnp.full((n, 1), 0.5),
                rng=jax.random.PRNGKey(2),
            )
            return total

        val, grads = jax.value_and_grad(loss)(params)
        assert np.isfinite(float(val))
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)
        # CP lines of both proposal nets receive gradient
        for key in ("0", "1"):
            assert (
                float(
                    jnp.abs(grads["proposal_networks"][key]["lines"]).sum()
                )
                > 0.0
            )
        # the wide-feature hash table receives gradient via the 1-corner
        # stochastic estimator
        assert float(jnp.abs(grads["fields"]["grid"]["table"]).sum()) > 0.0

        out = model.forward(params, rays, None, train=False)
        assert out["rgb"].shape == (n, 3)
        assert out["thermal"].shape == (n, 1)
