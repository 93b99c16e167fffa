"""Train + evaluate CLI — the primary entry point.

Equivalent of thermo_nerf/scripts/train_eval_script.py: pick a method config
by model type (:57-78), apply CLI overrides (:89-105), train, reload the
best checkpoint, evaluate with the dataset Otsu threshold, and write
metrics.json + eval images (:107-123).

For ModelType.THERMALNERFACTO the dataset is first rewritten on disk so
thermal images stand in for RGB (:84-87).

Run:  python -m thermo_tpu.scripts.train_eval --data <dataset> \
          --model-type thermal-nerf [--max-num-iterations N] ...

Quirk preserved: the ``seed`` parameter exists on the reference CLI but is
never wired into training (train_eval_script.py:36-37); here we DO seed the
train state with it (documented fix — reproducibility is load-bearing for a
TPU framework).
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Optional

from thermo_tpu.configs import METHOD_CONFIGS
from thermo_tpu.engine import checkpoints as ckpt
from thermo_tpu.engine.evaluator import Evaluator
from thermo_tpu.engine.pipeline import build_pipeline, load_pipeline_from_dir
from thermo_tpu.engine.trainer import Trainer
from thermo_tpu.metrics.otsu import calculate_threshold
from thermo_tpu.modalities import ModelType, RenderedImageModality
from thermo_tpu.thermal_as_rgb import thermal_as_rgb
from thermo_tpu.utils.cli import parse_cli

_MODEL_TYPE_TO_METHOD = {
    ModelType.THERMONERF: "thermal-nerf",
    ModelType.THERMALNERFACTO: "nerfacto-track",
    ModelType.NERFACTO: "nerfacto-track",
    ModelType.CONCATNERF: "concat_nerf",
}


@dataclasses.dataclass
class TrainingParameters:
    """Train a thermal NeRF and evaluate it."""

    model_type: ModelType = ModelType.THERMONERF
    experiment_name: str = "thermo-tpu-training"
    model_output_folder: Path = Path("./outputs")
    max_num_iterations: int = 30000
    data: Path = Path("./inputs")
    metrics_output_folder: Path = Path("./outputs/")
    seed: int = 0
    max_temperature: float = 1.0
    min_temperature: float = 0.0
    cold: bool = False
    camera_optimizer_mode: str = "SO3xR3"
    eval_mode: str = "filename"
    method: Optional[str] = None  # override method preset by name
    tiny: bool = False  # use the CPU-runnable tiny preset
    resume: bool = False  # resume from the latest checkpoint in the exp dir
    # TPU-throughput knobs (None = keep the method preset's values); see
    # ModelConfig.hash_grad_corners / proposal_fwd_corners / hash_fwd_corners.
    hash_grad_corners: Optional[int] = None
    proposal_fwd_corners: Optional[int] = None
    hash_fwd_corners: Optional[int] = None
    hash_grad_levels: Optional[int] = None
    # wall-clock training budget in seconds (iso-wall-clock ablations);
    # stops training when exceeded, before max_num_iterations
    max_seconds: Optional[float] = None
    # in-training eval-batch cadence override (reference default 500,
    # config_thermal_nerf.py:18); denser cadence = finer eval-loss
    # trajectories for overfit-wall evidence (outputs/qa_r4/iso1800)
    steps_per_eval_batch: Optional[int] = None
    # stop when the eval-batch quality metric hasn't improved for this many
    # consecutive eval batches, restoring the best-seen params (round-4
    # verdict item: the overfit wall demands early stopping). 0 = off.
    early_stop_patience: int = 0
    # late-training sample-count annealing (TrainerConfig.anneal_*): past
    # anneal_step the train step switches to these reduced per-ray sample
    # counts (PERFORMANCE.md roadmap #6). 0 = off.
    anneal_step: int = 0
    anneal_proposal_samples: Optional[tuple[int, ...]] = None
    anneal_nerf_samples: Optional[int] = None
    # cold-scene guard (round-5 verdict item 4): stochastic estimator knobs
    # measurably lose ~2.5 dB thermal PSNR on inverted (cold) scenes
    # (outputs/qa_r4/cold). With --cold they trigger a hard warning; pass
    # --cold-safe to auto-substitute the exact knobs instead.
    cold_safe: bool = False
    # Train-time viewer attach (round-5 verdict item 6, matching the
    # inherited ViewerConfig capability, config_thermal_nerf.py:46): serve
    # the HTTP orbit viewer DURING training on live param snapshots.
    viewer: bool = False
    viewer_port: int = 7007
    # Multi-chip: the trainer automatically builds a ("data",) mesh over all
    # visible devices (rays sharded, grads all-reduced over ICI by XLA);
    # model_parallel > 1 upgrades it to ("data","model") sharding the hash
    # tables too. --no-multichip forces single-device training.
    multichip: bool = True
    model_parallel: int = 1


def apply_cold_guard(config, cold_safe: bool = False):
    """Cold-scene guard (round-5 verdict item 4): the stochastic estimator
    knobs compound super-additively on inverted scenes — measured -2.46 dB
    thermal PSNR at iso-420s on the cold scene (outputs/qa_r4/cold +
    coldprobe: ff1 alone -0.88 dB, grad subsampling alone -0.79 dB; the
    sphereinv polarity probe in outputs/qa_r5 isolates inverted content as
    the mechanism). With ``cold_safe`` the knobs are zeroed (exact
    estimators); otherwise a hard warning is emitted and the config is
    returned unchanged (measurement runs must stay able to reproduce the
    regression)."""
    stochastic_knobs = {
        k: getattr(config.model, k)
        for k in (
            "hash_fwd_corners", "hash_grad_corners",
            "hash_grad_levels", "proposal_fwd_corners",
        )
        if getattr(config.model, k)
    }
    if not (config.model.cold and stochastic_knobs):
        return config
    if cold_safe:
        config.model = dataclasses.replace(
            config.model, **{k: 0 for k in stochastic_knobs}
        )
        print(
            "cold-safe: substituted exact estimator knobs for "
            f"{sorted(stochastic_knobs)} (stochastic estimators lose "
            "~2.5 dB thermal PSNR on cold/inverted scenes, "
            "outputs/qa_r4/cold)",
            flush=True,
        )
    else:
        import warnings

        warnings.warn(
            "cold=True with stochastic estimator knobs "
            f"{stochastic_knobs}: these knobs measurably lose ~2.5 dB "
            "thermal PSNR on inverted (cold) scenes at iso-wall-clock "
            "(outputs/qa_r4/cold — fast 11.53 dB vs exact 13.99 dB). "
            "Use --method thermal-nerf (exact) on cold scenes, or pass "
            "--cold-safe to auto-substitute the exact knobs.",
            stacklevel=2,
        )
    return config


def apply_capacity_advisory(config, num_train_images: int) -> None:
    """Small-capture capacity advisory (round 5): on 24-view synthetic
    scenes the full nerfacto-scale grid (16x2^19) is memorization-limited —
    ``thermal-nerf-tiny`` (8x2^15, max_res 256) beats the best full-capacity
    variant by +12.7 dB thermal PSNR on sphere (TPU iso-420s protocol:
    31.97 vs 19.30 dB) and +10.2 dB on the cold
    scene (outputs/qa_r5/RESULTS.md "Capacity probe"); sphereinv is the
    measured counterexample (-2.1 dB), so this only WARNS. Warning-only by
    design: capacity choice is scene-dependent and a silent substitution
    would change numerics under the user."""
    if num_train_images >= 50 or config.model.log2_hashmap_size < 17:
        return
    import warnings

    warnings.warn(
        f"{num_train_images} training views with a full-capacity grid "
        f"(2^{config.model.log2_hashmap_size} tables): small captures are "
        "measurably capacity-bound — thermal-nerf-tiny gained +12.7/+10.2 dB "
        "thermal PSNR over full-capacity presets on 24-view scenes "
        "(outputs/qa_r5/RESULTS.md). Consider --method thermal-nerf-tiny "
        "or a reduced log2_hashmap_size.",
        stacklevel=2,
    )


def modalities_for(model_type: ModelType) -> list[RenderedImageModality]:
    if model_type == ModelType.THERMONERF:
        return [
            RenderedImageModality.RGB,
            RenderedImageModality.THERMAL,
            RenderedImageModality.THERMAL_COMBINED,
        ]
    return [RenderedImageModality.RGB]


def main(parameters: TrainingParameters) -> Path:
    data = Path(parameters.data)
    if parameters.model_type == ModelType.THERMALNERFACTO:
        tmp_folder = Path("./data_folder/")
        thermal_as_rgb(thermal_dataset=tmp_folder, rgb_dataset=data)
        data = tmp_folder

    method = parameters.method or (
        "thermal-nerf-tiny" if parameters.tiny else _MODEL_TYPE_TO_METHOD[parameters.model_type]
    )
    config = METHOD_CONFIGS[method]()
    config.experiment_name = parameters.experiment_name
    config.output_dir = parameters.model_output_folder
    config.max_num_iterations = parameters.max_num_iterations
    config.seed = parameters.seed
    config.dataparser.data = data
    config.dataparser.eval_mode = parameters.eval_mode
    config.model = dataclasses.replace(
        config.model,
        max_temperature=parameters.max_temperature,
        min_temperature=parameters.min_temperature,
        cold=parameters.cold,
        camera_optimizer_mode=parameters.camera_optimizer_mode,
    )
    knob_overrides = {
        k: getattr(parameters, k)
        for k in (
            "hash_grad_corners",
            "proposal_fwd_corners",
            "hash_fwd_corners",
            "hash_grad_levels",
        )
        if getattr(parameters, k) is not None
    }
    if knob_overrides:
        config.model = dataclasses.replace(config.model, **knob_overrides)
    if parameters.steps_per_eval_batch is not None:
        config.steps_per_eval_batch = parameters.steps_per_eval_batch
    if parameters.anneal_step:
        config.anneal_step = parameters.anneal_step
        config.anneal_proposal_samples = parameters.anneal_proposal_samples
        config.anneal_nerf_samples = parameters.anneal_nerf_samples

    config = apply_cold_guard(config, cold_safe=parameters.cold_safe)

    pipe = build_pipeline(config)
    assert pipe.train_stack is not None and pipe.train_outputs is not None
    apply_capacity_advisory(config, int(pipe.train_stack.images.shape[0]))
    exp_dir = config.experiment_dir

    from thermo_tpu.utils.tracking import MetricsTracker

    tracker = MetricsTracker(exp_dir, parameters.experiment_name)

    def log_fn(log):
        print(
            f"step {log.step}: loss={log.metrics.get('total_loss', float('nan')):.4f} "
            f"psnr={log.metrics.get('psnr', float('nan')):.2f} "
            f"({log.rays_per_sec:,.0f} rays/s)",
            flush=True,
        )
        tracker.log_metrics(
            {
                **log.metrics,
                "rays_per_sec": log.rays_per_sec,
                "wall_time": log.wall_time,
            },
            log.step,
        )

    mesh = None
    if parameters.multichip:
        from thermo_tpu.parallel.mesh import auto_mesh

        mesh = auto_mesh(
            config.train_num_rays_per_batch, parameters.model_parallel
        )
        if mesh is not None:
            print(
                f"multichip: mesh {dict(mesh.shape)} over "
                f"{mesh.devices.size} devices",
                flush=True,
            )

    trainer = Trainer(
        config,
        pipe.model,
        pipe.train_cameras,
        pipe.train_stack.images,
        pipe.train_stack.thermal,
        mesh=mesh,
        log_fn=log_fn,
    )

    if pipe.eval_stack is not None:
        trainer.set_eval_data(
            pipe.eval_cameras, pipe.eval_stack.images, pipe.eval_stack.thermal
        )

    def save_cb(step, state):
        ckpt.save_checkpoint(
            exp_dir, step,
            {
                "params": state.params,
                "opt_state": state.opt_state,
                "steps_since_update": state.steps_since_update,
                "rng": state.rng,
            },
            config=config,
            dataparser_transform=pipe.train_outputs.dataparser_transform,
            dataparser_scale=pipe.train_outputs.dataparser_scale,
            keep_only_latest=config.save_only_latest_checkpoint,
        )

    if parameters.resume:
        latest = ckpt.latest_checkpoint(exp_dir)
        if latest is not None:
            saved, step = ckpt.load_checkpoint(latest)
            saved["step"] = step
            trainer.restore(saved)
            print(f"resumed from {latest} at step {step}", flush=True)

    if parameters.viewer:
        from thermo_tpu.viewer.server import ViewerServer

        trainer.refresh_viewer_params()
        live_viewer = ViewerServer(
            pipe,
            port=parameters.viewer_port,
            chunk_size=config.viewer_num_rays_per_chunk,
            params_fn=lambda: trainer.viewer_params,
        )
        live_viewer.start_background()
        print(
            f"viewer attached at http://localhost:{live_viewer.port} "
            "(live training renders)",
            flush=True,
        )

    t0 = time.time()
    trainer.train(
        checkpoint_cb=save_cb,
        max_seconds=parameters.max_seconds,
        early_stop_patience=parameters.early_stop_patience,
    )
    tracker.close()
    if trainer.early_stop is not None:
        print(f"early stop: {json.dumps(trainer.early_stop)}", flush=True)
    print(f"training done in {time.time()-t0:.0f}s", flush=True)

    # Reload best (latest) checkpoint and evaluate with the Otsu threshold.
    path_key = (
        "file_path"
        if parameters.model_type in (ModelType.NERFACTO, ModelType.THERMALNERFACTO)
        else "thermal_file_path"
    )
    threshold = calculate_threshold(data, path_key=path_key)
    eval_pipe = load_pipeline_from_dir(exp_dir, data=data)
    evaluator = Evaluator(
        eval_pipe,
        threshold=threshold,
        modalities_to_save=modalities_for(parameters.model_type),
    )
    evaluator.compute_metrics()
    out = Path(parameters.metrics_output_folder)
    evaluator.save_metrics(out)
    evaluator.save_images(out)
    print(json.dumps({k: v for k, v in evaluator.metrics.items() if k.endswith("_mean")}, indent=2))
    return exp_dir


def cli() -> None:
    from thermo_tpu.utils.platform import apply_env_platform

    apply_env_platform()
    main(parse_cli(TrainingParameters))


if __name__ == "__main__":
    cli()
