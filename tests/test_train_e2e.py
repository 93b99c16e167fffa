"""End-to-end training tests on the synthetic scene (CPU, tiny config):
loss decreases, checkpoints round-trip, evaluator writes metrics.json with
the reference schema, renderer produces frames/GIF."""

import dataclasses
import json
from pathlib import Path

import numpy as np
import pytest

from thermo_scenes_tpu.synthetic import make_synthetic_scene
from thermo_tpu.configs.methods import thermal_nerf_tiny_config
from thermo_tpu.engine import checkpoints as ckpt
from thermo_tpu.engine.evaluator import Evaluator
from thermo_tpu.engine.pipeline import build_pipeline, load_pipeline_from_dir
from thermo_tpu.engine.trainer import Trainer
from thermo_tpu.metrics.otsu import calculate_threshold
from thermo_tpu.modalities import RenderedImageModality


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return make_synthetic_scene(tmp_path_factory.mktemp("scene"), size=32)


@pytest.fixture(scope="module")
def tiny_config(scene, tmp_path_factory):
    cfg = thermal_nerf_tiny_config()
    cfg.dataparser.data = scene
    cfg.output_dir = tmp_path_factory.mktemp("out")
    cfg.experiment_name = "e2e"
    cfg.max_num_iterations = 60
    cfg.train_num_rays_per_batch = 128
    cfg.steps_per_jit_loop = 10
    cfg.steps_per_save = 60
    cfg.eval_num_rays_per_chunk = 1 << 10
    cfg.metrics_logging_frequency = 0.1  # log every 10 steps
    # shrink further for CPU speed
    cfg.model = dataclasses.replace(
        cfg.model,
        num_levels=4, max_res=64, log2_hashmap_size=11,
        num_proposal_samples_per_ray=(24, 12), num_nerf_samples_per_ray=8,
        far_plane=6.0,
    )
    return cfg


@pytest.fixture(scope="module")
def trained(tiny_config, scene):
    pipe = build_pipeline(tiny_config)
    trainer = Trainer(
        tiny_config, pipe.model, pipe.train_cameras,
        pipe.train_stack.images, pipe.train_stack.thermal,
    )
    exp_dir = tiny_config.experiment_dir

    def save_cb(step, state):
        ckpt.save_checkpoint(
            exp_dir, step, {"params": state.params, "opt_state": state.opt_state},
            config=tiny_config,
            dataparser_transform=pipe.train_outputs.dataparser_transform,
            dataparser_scale=pipe.train_outputs.dataparser_scale,
        )

    logs = trainer.train(checkpoint_cb=save_cb)
    return pipe, trainer, logs, exp_dir


class TestTraining:
    def test_loss_decreases(self, trained):
        _, trainer, logs, _ = trained
        losses = [l.metrics["total_loss"] for l in logs]
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_rays_per_sec_positive(self, trained):
        _, _, logs, _ = trained
        assert logs[-1].rays_per_sec > 0

    def test_wall_time_stamped_and_monotone(self, trained):
        # per-log wall clocks localize one-off stalls that a window-average
        # rays/s can only dilute (qa_r5 anneal-e8 tail)
        _, _, logs, _ = trained
        stamps = [l.wall_time for l in logs]
        assert all(s > 0 for s in stamps)
        assert stamps == sorted(stamps)

    def test_checkpoint_roundtrip(self, trained):
        pipe, trainer, _, exp_dir = trained
        path = ckpt.latest_checkpoint(exp_dir)
        assert path is not None
        restored, step = ckpt.load_checkpoint(path)
        assert step == 60
        orig = np.asarray(trainer.state.params["fields"]["grid"]["table"])
        rest = np.asarray(restored["params"]["fields"]["grid"]["table"])
        np.testing.assert_allclose(orig, rest, rtol=1e-6)

    def test_config_snapshot_roundtrip(self, trained):
        _, _, _, exp_dir = trained
        from thermo_tpu.configs.base import TrainerConfig

        cfg = TrainerConfig.load(exp_dir / "config.json")
        assert cfg.model.num_levels == 4
        assert cfg.method_name == "thermal-nerf-tiny"


class TestEvaluator:
    def test_metrics_json_schema(self, trained, scene, tmp_path):
        _, _, _, exp_dir = trained
        pipe = load_pipeline_from_dir(exp_dir, data=scene)
        threshold = calculate_threshold(scene)
        ev = Evaluator(pipe, threshold=threshold)
        metrics = ev.compute_metrics()
        for key in ("psnr", "psnr_thermal", "mae_thermal", "mae_thermal_foreground"):
            assert key in metrics
            assert f"{key}_mean" in metrics and f"{key}_std" in metrics
            assert len(metrics[key]) == 2  # two eval images
        ev.save_metrics(tmp_path)
        ev.save_images(tmp_path)
        blob = json.loads((tmp_path / "metrics.json").read_text())
        assert blob["method_name"] == "thermal-nerf-tiny"
        assert "results" in blob
        assert (tmp_path / "psnr" / "eval.txt").exists()
        assert (tmp_path / "img_00000.jpg").exists()
        assert (tmp_path / "thermal_00000.jpg").exists()


class TestRenderer:
    def test_viewer_render_pose(self, trained, scene):
        """ViewerServer renders all modalities to valid JPEGs from a trained
        pipeline (same chunked path the HTTP endpoint serves)."""
        from thermo_tpu.viewer.server import ViewerServer

        _, _, _, exp_dir = trained
        pipe = load_pipeline_from_dir(exp_dir, data=scene)
        server = ViewerServer(pipe, height=24, width=32, chunk_size=1 << 9)
        for modality in ("rgb", "thermal", "depth", "accumulation"):
            jpeg = server.render_pose(0.8, 1.2, 2.0, modality)
            assert jpeg[:2] == b"\xff\xd8", modality  # JPEG SOI marker

    def test_camera_path_render(self, trained, scene, tmp_path):
        _, _, _, exp_dir = trained
        # build a 3-frame camera path
        import math

        frames = []
        for i in range(3):
            a = 2 * math.pi * i / 3
            from thermo_scenes_tpu.synthetic import look_at_pose

            c2w = look_at_pose(
                np.array([1.5 * math.cos(a), 1.5 * math.sin(a), 0.8]), np.zeros(3)
            )
            frames.append(
                {"camera_to_world": c2w.reshape(-1).tolist(), "fov": 50.0, "aspect": 1.0}
            )
        path = tmp_path / "camera_path.json"
        path.write_text(
            json.dumps(
                {
                    "camera_type": "perspective",
                    "render_height": 32,
                    "render_width": 32,
                    "fps": 3,
                    "seconds": 1.0,
                    "camera_path": frames,
                }
            )
        )
        from thermo_tpu.engine.renderer import Renderer

        r = Renderer.from_pipeline_path(exp_dir, data=scene)
        cameras, meta = Renderer.load_cameras(path)
        mods = [RenderedImageModality.RGB, RenderedImageModality.THERMAL]
        r.render(mods, cameras)
        r.save_images(mods, tmp_path)
        r.save_gif(mods, meta["seconds"], tmp_path)
        assert (tmp_path / "img_00000.jpeg").exists()
        assert (tmp_path / "thermal_00002.jpeg").exists()
        assert (tmp_path / "synthesized_video_thermal.gif").exists()


class TestOtherMethods:
    def _train(self, scene, tmp_path, method, model_type_kwargs):
        import dataclasses as dc

        from thermo_tpu.configs.methods import METHOD_CONFIGS
        from thermo_tpu.models.thermal_nerf import ProposalNetArgs

        cfg = METHOD_CONFIGS[method]()
        cfg.dataparser.data = scene
        cfg.output_dir = tmp_path
        cfg.experiment_name = method
        cfg.max_num_iterations = 30
        cfg.train_num_rays_per_batch = 64
        cfg.steps_per_jit_loop = 10
        cfg.steps_per_save = 30
        cfg.eval_num_rays_per_chunk = 1 << 10
        cfg.mixed_precision = False
        overrides = dict(
            num_levels=2, max_res=32, log2_hashmap_size=9,
            num_proposal_samples_per_ray=(12, 8), num_nerf_samples_per_ray=6,
            proposal_net_args_list=(
                ProposalNetArgs(num_levels=2, max_res=16, log2_hashmap_size=7, hidden_dim=8),
            ) * 2,
            far_plane=6.0, compute_dtype="float32",
        )
        overrides.update(model_type_kwargs)
        cfg.model = dc.replace(cfg.model, **overrides)
        pipe = build_pipeline(cfg)
        trainer = Trainer(
            cfg, pipe.model, pipe.train_cameras,
            pipe.train_stack.images, pipe.train_stack.thermal,
        )

        def save_cb(step, state):
            ckpt.save_checkpoint(
                cfg.experiment_dir, step,
                {"params": state.params, "opt_state": state.opt_state},
                config=cfg,
                dataparser_transform=pipe.train_outputs.dataparser_transform,
                dataparser_scale=pipe.train_outputs.dataparser_scale,
            )

        trainer.train(checkpoint_cb=save_cb)
        return cfg.experiment_dir

    def test_concat_method_end_to_end(self, scene, tmp_path):
        exp = self._train(scene, tmp_path, "concat_nerf", {})
        pipe = load_pipeline_from_dir(exp, data=scene)
        ev = Evaluator(pipe, threshold=0.3)
        metrics = ev.compute_metrics()
        # concat metrics are computed on the thermal channel only
        for key in ("psnr", "ssim", "mae_thermal", "mae_thermal_foreground"):
            assert f"{key}_mean" in metrics
        assert "psnr_thermal" not in metrics

    def test_rgb_method_end_to_end(self, scene, tmp_path):
        exp = self._train(scene, tmp_path, "nerfacto-track", {})
        pipe = load_pipeline_from_dir(exp, data=scene)
        ev = Evaluator(pipe, threshold=0.3)
        metrics = ev.compute_metrics()
        for key in ("psnr", "ssim", "mae", "mae_foreground"):
            assert f"{key}_mean" in metrics
        assert "mae_thermal" not in metrics

    def test_tpu_preset_knobs_end_to_end(self, scene, tmp_path):
        """thermal-nerf-tpu estimator knobs train end-to-end and evaluate
        (eval renders use exact trilinear regardless of the knobs)."""
        exp = self._train(
            scene, tmp_path, "thermal-nerf",
            {"hash_grad_corners": 2, "proposal_fwd_corners": 2},
        )
        pipe = load_pipeline_from_dir(exp, data=scene)
        ev = Evaluator(pipe, threshold=0.3)
        metrics = ev.compute_metrics()
        for key in ("psnr", "psnr_thermal", "mae_thermal"):
            assert f"{key}_mean" in metrics
        assert np.isfinite(metrics["psnr_mean"])

    def test_triplane_proposals_end_to_end(self, scene, tmp_path):
        """Triplane (K-planes) proposal fields train end-to-end, checkpoint
        round-trip, and evaluate (round-4 quality lever, ops/triplane.py)."""
        from thermo_tpu.models.thermal_nerf import ProposalNetArgs

        exp = self._train(
            scene, tmp_path, "thermal-nerf",
            {
                "proposal_net_args_list": (
                    ProposalNetArgs(kind="triplane", max_res=17, rank=4, hidden_dim=8),
                    ProposalNetArgs(kind="triplane", max_res=33, rank=4, hidden_dim=8),
                )
            },
        )
        pipe = load_pipeline_from_dir(exp, data=scene)
        ev = Evaluator(pipe, threshold=0.3)
        metrics = ev.compute_metrics()
        for key in ("psnr", "psnr_thermal", "mae_thermal"):
            assert f"{key}_mean" in metrics
        assert np.isfinite(metrics["psnr_mean"])


class TestSceneVariants:
    """Round-4 verdict item 5: quality evidence must span more than one
    scene — the cold variant exercises the inverted Otsu mask end-to-end."""

    def test_cold_scene_end_to_end(self, tmp_path):
        from thermo_scenes_tpu.synthetic import make_synthetic_scene

        scene = make_synthetic_scene(tmp_path / "cold", size=32, variant="cold")
        bounds = json.loads((scene / "temperature_bounds.json").read_text())
        assert bounds["cold"] is True

        threshold = calculate_threshold(scene)
        # the cold foreground must sit BELOW the Otsu threshold
        import PIL.Image

        th = np.asarray(
            PIL.Image.open(scene / "thermal" / "frame_train_00000.png")
        ) / 255.0
        frac_below = float((th < threshold).mean())
        assert 0.05 < frac_below < 0.6, (threshold, frac_below)

        exp = TestOtherMethods()._train(
            scene, tmp_path, "thermal-nerf", {"cold": True}
        )
        pipe = load_pipeline_from_dir(exp, data=scene)
        assert pipe.model.config.cold is True
        ev = Evaluator(pipe, threshold=threshold)
        metrics = ev.compute_metrics()
        for key in ("mae_thermal", "mae_thermal_foreground"):
            assert f"{key}_mean" in metrics
            assert np.isfinite(metrics[f"{key}_mean"])

    def test_multi_scene_trains(self, tmp_path):
        from thermo_scenes_tpu.synthetic import make_synthetic_scene

        scene = make_synthetic_scene(tmp_path / "multi", size=32, variant="multi")
        exp = TestOtherMethods()._train(scene, tmp_path, "thermal-nerf", {})
        pipe = load_pipeline_from_dir(exp, data=scene)
        ev = Evaluator(pipe, threshold=calculate_threshold(scene))
        metrics = ev.compute_metrics()
        assert np.isfinite(metrics["psnr_mean"])
        assert np.isfinite(metrics["mae_thermal_mean"])
