"""ThermoNeRF model: config, forward pass, and loss computation.

TPU-native equivalent of the reference's model layer:
  * thermo_nerf/thermal_nerf/thermal_nerf_model.py ``ThermalNerfModel``
    (config :46-56, populate_modules :86-208, get_outputs :210-275,
    get_loss_dict :277-326)
  * thermo_nerf/nerfacto_config/thermal_nerfacto.py ``ThermalNerfactoModel``
    (plain nerfacto + temperature bounds — the thermal-as-RGB baseline)
  * thermo_nerf/rgb_concat/concat_nerfacto_model.py ``ConcatNerfModel``
    (single 4-channel RGBT head)

Instead of nerfstudio's Model/Pipeline class lattice, the model is a thin
binder over pure functions: ``init_params`` builds a parameter pytree with
top-level groups ("fields", "proposal_networks", "camera_opt") matching the
reference's optimizer groups, and ``forward``/``losses`` are pure jittable
functions of (params, rays, gt, rng, schedule scalars).

Behavioral quirks preserved from the reference (SURVEY §7):
  * ``thermal_loss_weight`` exists in config but is NOT applied — the
    thermal loss is unweighted MSE (thermal_nerf_model.py:53-54 vs :321-324).
  * thermal renderer always composites against the last sample
    (thermal_renderer.py:49).
  * ThermalNerfModel does NOT add the camera-opt regularizer loss that
    ConcatNerfModel adds (concat_nerfacto_model.py:232).
  * thermal head output is unbounded during training, clamped [0,1] only at
    eval (thermal_renderer.py:146-147).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import Array

from thermo_tpu.data.cameras import RayBundle
from thermo_tpu.models import camera_opt as co
from thermo_tpu.models.field import (
    CPDensityField,
    HashMLPDensityField,
    ThermalNerfactoField,
    TriplaneDensityField,
)
from thermo_tpu.ops import losses as L
from thermo_tpu.ops import rendering as R
from thermo_tpu.ops.samplers import (
    ProposalSamplerConfig,
    proposal_anneal,
    proposal_sample,
)

Params = Any


@dataclasses.dataclass(frozen=True)
class ProposalNetArgs:
    """One proposal density-field preset (nerfacto proposal_net_args_list).

    ``kind="hash"`` builds the reference-parity HashMLPDensityField;
    ``kind="cp"`` builds the TPU-native CPDensityField (two-hot matmul
    encoding at ``max_res`` resolution, rank ``rank`` — see ops/lowrank.py);
    ``kind="triplane"`` builds the TPU-native TriplaneDensityField (K-planes
    product of three bilinear planes at ``max_res`` resolution with ``rank``
    features/plane, matmul fwd+bwd — see ops/triplane.py).
    """

    hidden_dim: int = 16
    log2_hashmap_size: int = 17
    num_levels: int = 5
    base_res: int = 16
    max_res: int = 128
    use_linear: bool = False
    features_per_level: int = 2
    kind: str = "hash"  # "hash" | "cp" | "triplane"
    rank: int = 32


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static model config; nerfacto defaults + thermal extras.

    Mirrors NerfactoModelConfig (nerfstudio 1.1.5) as configured by
    ThermalNerfModelConfig / ThermalNerfactoModelConfig / ConcatNerfModelConfig.
    """

    mode: str = "thermal"  # "thermal" | "rgb" | "concat"

    # collider
    near_plane: float = 0.05
    far_plane: float = 1000.0

    # field geometry
    hidden_dim: int = 64
    hidden_dim_color: int = 64
    hidden_dim_transient: int = 64
    num_levels: int = 16
    base_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    geo_feat_dim: int = 15
    appearance_embed_dim: int = 32
    use_average_appearance_embedding: bool = True
    average_init_density: float = 1.0
    disable_scene_contraction: bool = False

    # sampling
    num_proposal_samples_per_ray: tuple[int, ...] = (256, 96)
    num_nerf_samples_per_ray: int = 48
    proposal_update_every: int = 5
    proposal_warmup: int = 5000
    num_proposal_iterations: int = 2
    use_same_proposal_network: bool = False
    proposal_net_args_list: tuple[ProposalNetArgs, ...] = (
        ProposalNetArgs(max_res=128),
        ProposalNetArgs(max_res=256),
    )
    proposal_initial_sampler: str = "piecewise"
    use_single_jitter: bool = True
    use_proposal_weight_anneal: bool = True
    proposal_weights_anneal_slope: float = 10.0
    proposal_weights_anneal_max_num_iters: int = 1000

    # rendering / losses
    background_color: str = "last_sample"
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 0.002
    orientation_loss_mult: float = 0.0001
    pred_normal_loss_mult: float = 0.001
    use_gradient_scaling: bool = False
    predict_normals: bool = False
    use_transient_embedding: bool = False

    # thermal extras (ThermalNerfactoModelConfig / ThermalNerfModelConfig)
    max_temperature: float = 1.0
    min_temperature: float = 0.0
    cold: bool = False
    thermal_loss_weight: float = 1.0  # declared but unused — parity quirk
    pass_thermal_gradients: bool = True

    # camera optimizer
    camera_optimizer_mode: str = "SO3xR3"  # "off" | "SO3xR3" | "SE3"

    # numerics
    compute_dtype: str = "bfloat16"

    # TPU throughput knobs (0 = exact trilinear everywhere — full reference
    # parity). hash_grad_corners=k routes each table cotangent to k corners
    # drawn ~ Categorical(trilinear weights) with value g/k (UNBIASED, 8/k
    # less scatter traffic; position grads stay exact). proposal_fwd_corners=k
    # evaluates proposal hash features as the mean of k sampled corners
    # (unbiased features, 8/k less gather+scatter; proposal encodings stop
    # carrying position gradients). See ops/hash_encoding.py and
    # PERFORMANCE.md for measured speed/quality trade-offs.
    hash_grad_corners: int = 0
    proposal_fwd_corners: int = 0
    # Stochastic-trilinear FORWARD on the FINAL field (0 = exact): training
    # features become the mean of k Categorical(trilinear-weight)-sampled
    # corners (unbiased); gather traffic drops 8/k and the backward needs no
    # re-gather. Position gradients through the final encoding become zero —
    # camera-pose gradients then flow only through the proposal fields and
    # the compositing geometry. Eval renders stay exact.
    hash_fwd_corners: int = 0
    # Level-subsampled table gradients on the final field (0 = all levels):
    # each point scatters into hash_grad_levels uniformly-drawn levels with
    # value scaled L/j — unbiased, scatter traffic drops L/j further.
    # Requires hash_grad_corners>0 or hash_fwd_corners>0.
    hash_grad_levels: int = 0

    def sampler_config(self) -> ProposalSamplerConfig:
        return ProposalSamplerConfig(
            num_nerf_samples_per_ray=self.num_nerf_samples_per_ray,
            num_proposal_samples_per_ray=self.num_proposal_samples_per_ray,
            num_proposal_iterations=self.num_proposal_iterations,
            single_jitter=self.use_single_jitter,
            initial_sampler=self.proposal_initial_sampler,
            update_every=self.proposal_update_every,
            warmup=self.proposal_warmup,
            anneal_slope=self.proposal_weights_anneal_slope,
            anneal_max_iters=self.proposal_weights_anneal_max_num_iters,
        )


class ThermoNerfModel:
    """Binder holding the flax modules + pure forward/loss functions."""

    def __init__(self, config: ModelConfig, aabb, num_train_images: int):
        self.config = config
        self.aabb = tuple(map(tuple, aabb))
        self.num_train_images = num_train_images
        dtype = jnp.dtype(config.compute_dtype)

        self.field = ThermalNerfactoField(
            aabb=self.aabb,
            num_images=num_train_images,
            mode=config.mode,
            num_layers=2,
            hidden_dim=config.hidden_dim,
            geo_feat_dim=config.geo_feat_dim,
            num_levels=config.num_levels,
            base_res=config.base_res,
            max_res=config.max_res,
            log2_hashmap_size=config.log2_hashmap_size,
            num_layers_color=3,
            features_per_level=config.features_per_level,
            hidden_dim_color=config.hidden_dim_color,
            hidden_dim_thermal=config.hidden_dim_transient,
            appearance_embedding_dim=config.appearance_embed_dim,
            use_average_appearance_embedding=config.use_average_appearance_embedding,
            use_contraction=not config.disable_scene_contraction,
            average_init_density=config.average_init_density,
            pass_thermal_gradients=config.pass_thermal_gradients,
            use_transient_embedding=config.use_transient_embedding,
            use_pred_normals=config.predict_normals,
            compute_dtype=dtype,
            hash_grad_corners=config.hash_grad_corners,
            hash_fwd_corners=config.hash_fwd_corners,
            hash_grad_levels=config.hash_grad_levels,
        )
        n = config.num_proposal_iterations
        if config.use_same_proposal_network:
            assert len(config.proposal_net_args_list) == 1
            args_list = [config.proposal_net_args_list[0]]
        else:
            args_list = [
                config.proposal_net_args_list[
                    min(i, len(config.proposal_net_args_list) - 1)
                ]
                for i in range(n)
            ]
        def _build_proposal(a: ProposalNetArgs):
            if a.kind == "triplane":
                return TriplaneDensityField(
                    aabb=self.aabb,
                    resolution=a.max_res,
                    rank=a.rank,
                    num_layers=2,
                    hidden_dim=a.hidden_dim,
                    use_linear=a.use_linear,
                    use_contraction=not config.disable_scene_contraction,
                    average_init_density=config.average_init_density,
                    compute_dtype=dtype,
                )
            if a.kind == "cp":
                return CPDensityField(
                    aabb=self.aabb,
                    resolution=a.max_res,
                    rank=a.rank,
                    num_layers=2,
                    hidden_dim=a.hidden_dim,
                    use_linear=a.use_linear,
                    use_contraction=not config.disable_scene_contraction,
                    average_init_density=config.average_init_density,
                    compute_dtype=dtype,
                )
            return HashMLPDensityField(
                aabb=self.aabb,
                num_levels=a.num_levels,
                max_res=a.max_res,
                base_res=a.base_res,
                log2_hashmap_size=a.log2_hashmap_size,
                features_per_level=a.features_per_level,
                num_layers=2,
                hidden_dim=a.hidden_dim,
                use_linear=a.use_linear,
                use_contraction=not config.disable_scene_contraction,
                average_init_density=config.average_init_density,
                compute_dtype=dtype,
                fwd_corners=config.proposal_fwd_corners,
            )

        self.proposal_nets = [_build_proposal(a) for a in args_list]
        self.sampler_cfg = config.sampler_config()

    # ------------------------------------------------------------------
    # params
    # ------------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> Params:
        keys = jax.random.split(rng, 2 + len(self.proposal_nets))
        dummy_pos = jnp.zeros((1, 1, 3))
        dummy_dir = jnp.ones((1, 1, 3))
        dummy_cam = jnp.zeros((1, 1), jnp.int32)
        field_vars = self.field.init(keys[0], dummy_pos, dummy_dir, dummy_cam)
        prop_vars = {
            str(i): net.init(keys[1 + i], dummy_pos)["params"]
            for i, net in enumerate(self.proposal_nets)
        }
        if self.config.use_same_proposal_network:
            prop_vars = {"0": prop_vars["0"]}
        params = {
            "fields": field_vars["params"],
            "proposal_networks": prop_vars,
        }
        if self.config.camera_optimizer_mode != "off":
            params["camera_opt"] = co.init_pose_adjustment(self.num_train_images)
        return params

    def _density_fns(self, params: Params, train: bool = True):
        """Proposal density closures. Eval uses exact trilinear (the
        stochastic fwd_corners estimator is a training-only knob)."""
        fns = []
        for i in range(self.config.num_proposal_iterations):
            key = "0" if self.config.use_same_proposal_network else str(i)
            net = self.proposal_nets[min(i, len(self.proposal_nets) - 1)]
            p = params["proposal_networks"][key]
            fns.append(
                lambda pos, net=net, p=p: net.apply(
                    {"params": p}, pos, exact=not train
                )
            )
        return fns

    # ------------------------------------------------------------------
    # forward
    # ------------------------------------------------------------------
    def forward(
        self,
        params: Params,
        rays: RayBundle,
        rng: Optional[jax.Array],
        step: Array | float = 0.0,
        prop_grad_flag: Array | float = 1.0,
        train: bool = True,
        apply_camera_opt: Optional[bool] = None,
    ) -> dict[str, Any]:
        """Model forward (thermal_nerf_model.py get_outputs :210-275).

        Returns an outputs dict; when ``train`` it also contains the sampler
        aux needed by ``losses`` (final/proposal segments and weights).
        Camera-optimizer deltas are applied when training (and optionally at
        eval by the Evaluator, matching evaluator.py:71-76) — control with
        ``apply_camera_opt`` (default: == train).
        """
        cfg = self.config
        if apply_camera_opt is None:
            apply_camera_opt = train
        origins, directions = rays.origins, rays.directions
        if apply_camera_opt and cfg.camera_optimizer_mode != "off" and "camera_opt" in params:
            deltas = co.camera_deltas(
                params["camera_opt"], rays.camera_indices, cfg.camera_optimizer_mode
            )
            if deltas is not None:
                origins = origins + deltas[..., :3, 3]
                directions = jnp.einsum(
                    "rij,rj->ri", deltas[..., :3, :3], directions
                )

        num_rays = origins.shape[0]
        near = jnp.full((num_rays, 1), cfg.near_plane, jnp.float32)
        far = jnp.full((num_rays, 1), cfg.far_plane, jnp.float32)

        step = jnp.asarray(step, jnp.float32)
        anneal = (
            proposal_anneal(step, self.sampler_cfg)
            if (train and cfg.use_proposal_weight_anneal)
            else jnp.asarray(1.0)
        )

        samples = proposal_sample(
            rng,
            self._density_fns(params, train=train),
            origins,
            directions,
            near,
            far,
            self.sampler_cfg,
            anneal=anneal,
            prop_grad_flag=prop_grad_flag,
            train=train,
        )
        seg = samples.final
        positions = seg.positions(origins, directions)  # [R, S, 3]
        dirs = jnp.broadcast_to(directions[:, None, :], positions.shape)
        cam_idx = jnp.broadcast_to(
            rays.camera_indices[:, None], positions.shape[:-1]
        )

        field_out = self.field.apply(
            {"params": params["fields"]},
            positions,
            dirs,
            cam_idx,
            train=train,
            compute_normals=cfg.predict_normals,
        )
        density = field_out["density"]
        if cfg.use_gradient_scaling:
            tmids = (seg.starts + seg.ends) / 2.0
            field_out = {
                k: (L.scale_gradients_by_distance_squared(v, tmids) if k != "density" else v)
                for k, v in field_out.items()
            }
            density = L.scale_gradients_by_distance_squared(density, tmids)

        weights = R.render_weights(density, seg.starts, seg.ends)

        outputs: dict[str, Any] = {}
        if cfg.mode == "concat":
            rgbt = R.render_rgbt(field_out["rgbt"], weights, train=train)
            outputs["rgb"] = rgbt  # 4 channels: RGB + thermal
            outputs["thermal"] = rgbt[..., 3:4]
        else:
            outputs["rgb"] = R.render_rgb(
                field_out["rgb"], weights, background=cfg.background_color, train=train
            )
            if cfg.mode == "thermal":
                outputs["thermal"] = R.render_thermal(
                    field_out["thermal"], weights, train=train
                )

        if cfg.predict_normals:
            # NormalsRenderer (weights-sum) + NormalsShader ((n+1)/2) on the
            # eval outputs; raw per-sample normals kept in aux for the
            # orientation / pred-normal losses (nerfstudio losses.py).
            normals = R.accumulate(field_out["normals"], weights)
            pred_normals = R.accumulate(field_out["pred_normals"], weights)
            outputs["normals"] = (normals + 1.0) / 2.0
            outputs["pred_normals"] = (pred_normals + 1.0) / 2.0
            if train:
                n_dot_v = jnp.sum(field_out["normals"] * dirs, axis=-1)
                outputs["rendered_orientation_loss"] = jnp.sum(
                    weights[..., 0] * jnp.square(jnp.minimum(0.0, n_dot_v)), axis=-1
                )
                outputs["rendered_pred_normal_loss"] = jnp.sum(
                    weights[..., 0]
                    * (
                        1.0
                        - jnp.sum(
                            jax.lax.stop_gradient(field_out["normals"])
                            * field_out["pred_normals"],
                            axis=-1,
                        )
                    ),
                    axis=-1,
                )

        outputs["accumulation"] = R.render_accumulation(weights)
        outputs["depth"] = jax.lax.stop_gradient(
            R.render_depth_median(weights, seg.starts, seg.ends)
        )
        outputs["expected_depth"] = R.render_depth_expected(
            weights, seg.starts, seg.ends
        )
        for i, (pseg, pw) in enumerate(zip(samples.prop_segments, samples.prop_weights)):
            outputs[f"prop_depth_{i}"] = R.render_depth_median(
                pw, pseg.starts, pseg.ends
            )
        if train:
            outputs["_aux"] = {
                "final_sbins": seg.sbins,
                "final_weights": weights,
                "prop_sbins": tuple(s.sbins for s in samples.prop_segments),
                "prop_weights": samples.prop_weights,
            }
        return outputs

    # ------------------------------------------------------------------
    # losses / train metrics
    # ------------------------------------------------------------------
    def losses(
        self,
        params: Params,
        outputs: dict[str, Any],
        gt_rgb: Array,
        gt_thermal: Optional[Array],
        rng: Optional[jax.Array] = None,
    ) -> tuple[Array, dict[str, Array]]:
        """get_loss_dict + get_metrics_dict for one train batch.

        ``gt_rgb``: [R, 3] (or [R, 4] RGBT for concat); ``gt_thermal``: [R, 1].
        Returns (total_loss, dict of loss/metric scalars).
        """
        cfg = self.config
        aux = outputs["_aux"]
        loss_dict: dict[str, Array] = {}

        bg = "random" if cfg.mode == "concat" else cfg.background_color
        pred_rgb, gt_blended = R.blend_background_for_loss(
            outputs["rgb"], outputs["accumulation"], gt_rgb, background=bg, rng=rng
        )
        loss_dict["rgb_loss"] = L.mse(gt_blended, pred_rgb)

        loss_dict["interlevel_loss"] = cfg.interlevel_loss_mult * L.interlevel_loss(
            aux["final_sbins"], aux["final_weights"], aux["prop_sbins"], aux["prop_weights"]
        )
        distortion = L.distortion_loss(aux["final_sbins"], aux["final_weights"])
        loss_dict["distortion_loss"] = cfg.distortion_loss_mult * distortion

        if cfg.predict_normals and "rendered_orientation_loss" in outputs:
            loss_dict["orientation_loss"] = cfg.orientation_loss_mult * jnp.mean(
                outputs["rendered_orientation_loss"]
            )
            loss_dict["pred_normal_loss"] = cfg.pred_normal_loss_mult * jnp.mean(
                outputs["rendered_pred_normal_loss"]
            )

        if cfg.mode == "thermal" and cfg.pass_thermal_gradients and gt_thermal is not None:
            # NOTE: unweighted MSE — thermal_loss_weight intentionally unused
            # (reference parity, thermal_nerf_model.py:321-324).
            loss_dict["thermal"] = L.mse(outputs["thermal"], gt_thermal)

        # Camera-opt regularizer: added by concat (concat_nerfacto_model.py:232)
        # AND rgb mode (ThermalNerfactoModel does not override get_loss_dict,
        # so it inherits nerfstudio 1.1.5 NerfactoModel's, which calls
        # camera_optimizer.get_loss_dict). ThermalNerfModel's own override
        # omits it (thermal_nerf_model.py:277-326) — thermal-mode quirk kept.
        has_camera_opt = cfg.camera_optimizer_mode != "off" and "camera_opt" in params
        if cfg.mode in ("concat", "rgb") and has_camera_opt:
            loss_dict["camera_opt_regularizer"] = co.camera_opt_regularizer(
                params["camera_opt"]
            )

        total = jnp.sum(jnp.stack(list(loss_dict.values())))
        metrics = dict(loss_dict)
        metrics["distortion"] = distortion
        if has_camera_opt:
            # Every mode logs these: get_metrics_dict is inherited from
            # NerfactoModel (which calls camera_optimizer.get_metrics_dict)
            # in all three reference models.
            metrics.update(co.camera_opt_metrics(params["camera_opt"]))
        mse_rgb = L.mse(gt_blended, pred_rgb)
        metrics["psnr"] = -10.0 * jnp.log10(jnp.maximum(mse_rgb, 1e-12))
        return total, metrics
