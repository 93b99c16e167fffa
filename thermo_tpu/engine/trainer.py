"""Jitted training loop.

TPU-native equivalent of the nerfstudio Trainer + VanillaPipeline +
VanillaDataManager stack the reference inherits (SURVEY §3.1), redesigned for
XLA's compilation model instead of translated:

  * The ENTIRE train step is one jitted function: device-side pixel
    sampling (jax.random over the HBM-resident image stack), device-side
    ray generation, proposal sampling, field eval, compositing, losses,
    gradients, and optax updates. Zero host<->device transfers in steady
    state; ``steps_per_jit_loop`` steps are lax.scan'd per host dispatch.
  * Mixed precision is bf16 compute dtype (no GradScaler — bf16 has fp32
    range, unlike the reference's fp16 AMP, pipeline_tracking.py:7).
  * Data parallelism: ray batches sharded over a 1-D ("data",) jax mesh via
    sharding constraints; XLA inserts the gradient all-reduce over ICI and
    overlaps it with the backward pass (replaces the reference's unused
    torch DDP plumbing, SURVEY §2c).

The proposal-network update schedule (steps_since_update gating,
thermal_nerf_model.py:152-161 + nerfstudio ProposalNetworkSampler) is kept
branch-free inside jit with a traced multiplicative gradient gate.
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from thermo_tpu.configs.base import TrainerConfig
from thermo_tpu.data.cameras import Cameras, RayBundle, generate_rays
from thermo_tpu.engine.optimizers import make_optimizer
from thermo_tpu.models.thermal_nerf import ThermoNerfModel
from thermo_tpu.ops.samplers import proposal_update_schedule


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: Array  # int32 scalar
    steps_since_update: Array  # int32 scalar
    rng: Array


def create_train_state(
    model: ThermoNerfModel, config: TrainerConfig, rng: jax.Array
) -> tuple[TrainState, optax.GradientTransformation]:
    params = model.init_params(rng)
    tx = make_optimizer(config.optimizers, params)
    opt_state = tx.init(params)
    state = TrainState(
        params=params,
        opt_state=opt_state,
        step=jnp.asarray(0, jnp.int32),
        steps_since_update=jnp.asarray(0, jnp.int32),
        rng=jax.random.fold_in(rng, 1),
    )
    return state, tx


def _make_one_step(model, tx, config, mesh):
    """Shared optimizer-step body of both train-step builders.

    Returns ``one_step(state, batch, cameras) -> (state, metrics)`` where
    ``batch = (img, py, px, gt_rgb, gt_thermal)`` (gt_thermal may be None
    for the rgb mode). Batch acquisition — device-side PRNG sampling vs
    host-fed arrays — is the only difference between the builders.
    """
    concat = model.config.mode == "concat"

    def shard(x):
        if mesh is None or x is None:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))

    def one_step(state: TrainState, batch, cameras: Cameras):
        img, py, px, gt_rgb, gt_thermal = (shard(x) for x in batch)
        rng, k_fwd, k_bg = jax.random.split(state.rng, 3)
        rays = generate_rays(cameras, img, py, px)
        rays = RayBundle(*(shard(r) for r in rays))

        sched = proposal_update_schedule(
            state.step.astype(jnp.float32), model.sampler_cfg
        )
        updated = (state.steps_since_update.astype(jnp.float32) > sched) | (
            state.step < 10
        )
        flag = updated.astype(jnp.float32)

        def loss_fn(params):
            out = model.forward(
                params,
                rays,
                k_fwd,
                step=state.step.astype(jnp.float32),
                prop_grad_flag=flag,
                train=True,
            )
            gt = (
                jnp.concatenate([gt_rgb, gt_thermal], axis=-1) if concat else gt_rgb
            )
            return model.losses(params, out, gt, gt_thermal, rng=k_bg)

        (total, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        new_ssu = jnp.where(updated, 0, state.steps_since_update) + 1
        new_state = TrainState(
            params=params,
            opt_state=opt_state,
            step=state.step + 1,
            steps_since_update=new_ssu,
            rng=rng,
        )
        metrics = dict(metrics)
        metrics["total_loss"] = total
        return new_state, metrics

    return one_step, shard


def make_train_step(
    model: ThermoNerfModel,
    tx: optax.GradientTransformation,
    config: TrainerConfig,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Build the jitted multi-step train function.

    Returns ``fn(state, images_u8, thermal_u8, cameras) -> (state, metrics)``
    running ``config.steps_per_jit_loop`` optimizer steps per call, with
    metrics averaged over the scanned steps. ``thermal_u8`` may be a
    zero-size placeholder for the rgb mode.
    """
    num_rays = config.train_num_rays_per_batch
    use_thermal_gt = model.config.mode in ("thermal", "concat")
    one_step, shard = _make_one_step(model, tx, config, mesh)

    def sampled_step(carry, _, images, thermal, cameras: Cameras):
        state: TrainState = carry
        # split off the sampling keys; one_step re-splits state.rng for the
        # forward/background keys, so thread a fresh rng through the state
        rng, k_img, k_y, k_x = jax.random.split(state.rng, 4)
        n, h, w = images.shape[0], images.shape[1], images.shape[2]
        img = jax.random.randint(k_img, (num_rays,), 0, n)
        py = jax.random.randint(k_y, (num_rays,), 0, h)
        px = jax.random.randint(k_x, (num_rays,), 0, w)
        img, py, px = shard(img), shard(py), shard(px)
        gt_rgb = images[img, py, px].astype(jnp.float32) / 255.0
        gt_thermal = (
            thermal[img, py, px].astype(jnp.float32) / 255.0
            if use_thermal_gt
            else None
        )
        state = dataclasses.replace(state, rng=rng)
        return one_step(state, (img, py, px, gt_rgb, gt_thermal), cameras)

    @partial(jax.jit, donate_argnums=(0,))
    def train_steps(state, images, thermal, cameras):
        step_fn = partial(
            sampled_step, images=images, thermal=thermal, cameras=cameras
        )
        state, metrics = jax.lax.scan(
            step_fn, state, None, length=config.steps_per_jit_loop
        )
        return state, {k: jnp.mean(v) for k, v in metrics.items()}

    return train_steps


def make_train_step_fed(
    model: ThermoNerfModel,
    tx: optax.GradientTransformation,
    config: TrainerConfig,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Multi-host variant of ``make_train_step``: the pixel batch is sampled
    HOST-side per process from a host-local image shard (SURVEY §7 step 6 —
    per-host data loading of disjoint ray batches) and fed in as global
    sharded arrays; the jitted scan consumes one pre-sampled batch per step.

    Returns ``fn(state, cameras, img, py, px, gt_rgb, gt_thermal) ->
    (state, metrics)`` where the batch arrays have a leading
    ``steps_per_jit_loop`` axis and ``img`` holds GLOBAL camera indices.
    """
    one_step, _ = _make_one_step(model, tx, config, mesh)
    use_thermal_gt = model.config.mode in ("thermal", "concat")

    def fed_step(carry, xs, cameras: Cameras):
        img, py, px, gt_rgb, gt_thermal = xs
        if not use_thermal_gt:
            gt_thermal = None
        return one_step(carry, (img, py, px, gt_rgb, gt_thermal), cameras)

    @partial(jax.jit, donate_argnums=(0,))
    def train_steps(state, cameras, img, py, px, gt_rgb, gt_thermal):
        state, metrics = jax.lax.scan(
            partial(fed_step, cameras=cameras),
            state,
            (img, py, px, gt_rgb, gt_thermal),
        )
        return state, {k: jnp.mean(v) for k, v in metrics.items()}

    return train_steps


def make_render_fn(
    model: ThermoNerfModel,
    chunk_size: int,
    apply_camera_opt: bool = False,
) -> Callable:
    """Chunked eval renderer (model.get_outputs_for_camera_ray_bundle
    equivalent: eval chunk 2^16, config_thermal_nerf.py:30).

    Returns ``fn(params, cameras, camera_index, height, width) -> dict`` of
    full-image [H, W, C] numpy arrays. The per-chunk forward is jitted once
    (static chunk size, padded final chunk).
    """

    @jax.jit
    def render_chunk(params, cameras, cam_idx, py, px):
        rays = generate_rays(cameras, cam_idx, py, px)
        return model.forward(
            params, rays, None, train=False, apply_camera_opt=apply_camera_opt
        )

    def render_image(params, cameras: Cameras, camera_index: int, height: int, width: int):
        yy, xx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
        py = yy.reshape(-1).astype(np.int32)
        px = xx.reshape(-1).astype(np.int32)
        total = py.size
        outs: dict[str, list[np.ndarray]] = {}
        for start in range(0, total, chunk_size):
            end = min(start + chunk_size, total)
            pad = chunk_size - (end - start)
            cy = np.pad(py[start:end], (0, pad), mode="edge")
            cx = np.pad(px[start:end], (0, pad), mode="edge")
            idx = jnp.full((chunk_size,), camera_index, jnp.int32)
            out = render_chunk(params, cameras, idx, jnp.asarray(cy), jnp.asarray(cx))
            for k, v in out.items():
                if k.startswith("_"):
                    continue
                arr = np.asarray(v)[: end - start]
                outs.setdefault(k, []).append(arr)
        return {
            k: np.concatenate(v).reshape(height, width, -1) for k, v in outs.items()
        }

    return render_image


@dataclasses.dataclass
class TrainLog:
    step: int
    metrics: dict[str, float]
    rays_per_sec: float
    # Host wall-clock at log time (time.time()). rays_per_sec is a
    # window average between sync points; with per-log timestamps a
    # one-off stall (remote-tunnel hiccup, surprise recompile) can be
    # localized instead of just diluting the window rate — the
    # qa_r5 anneal-e8 run's ~0.4k rays/s tail was unattributable
    # without this.
    wall_time: float = 0.0


class Trainer:
    """Host-side training orchestrator (nerfstudio Trainer equivalent):
    owns the device data, drives the jitted step loop, periodic eval batches,
    checkpointing, and metric logging."""

    def __init__(
        self,
        config: TrainerConfig,
        model: ThermoNerfModel,
        cameras: Cameras,
        images_u8: np.ndarray,
        thermal_u8: Optional[np.ndarray],
        mesh: Optional[Mesh] = None,
        log_fn: Optional[Callable[[TrainLog], None]] = None,
        data_shards: int = 1,
        local_shard: Optional[int] = None,
    ):
        """``data_shards`` > 1 enables the HOST-DISJOINT data path (SURVEY §7
        step 6): the image stack is partitioned into ``data_shards`` equal
        contiguous shards, each sampled with its own deterministic per-step
        seed, and the global ray batch is the shard-ordered concatenation.
        ``local_shard`` names the single shard THIS process holds (multi-host:
        ``images_u8``/``thermal_u8``/``cameras`` are then the local slice of
        shard ``local_shard``, and the global batch is assembled across
        processes with ``jax.make_array_from_process_local_data``);
        ``local_shard=None`` keeps all shards on this process (the
        single-process oracle — the sampled global batch is IDENTICAL either
        way, which is what tests/test_multihost.py asserts). Note: with
        ``local_shard`` set, ``cameras`` must still be the GLOBAL camera set
        (small, replicated) so ray generation sees global indices."""
        self.config = config
        self.model = model
        self.mesh = mesh
        self.log_fn = log_fn
        self.cameras = cameras
        self.data_shards = int(data_shards)
        self.local_shard = local_shard
        self._images_np = np.asarray(images_u8)
        self._thermal_np = (
            np.asarray(thermal_u8)
            if thermal_u8 is not None
            else np.zeros((*images_u8.shape[:3], 1), np.uint8)
        )
        if self.data_shards > 1:
            # fed path: data stays host-side (numpy); keep 1-image device
            # placeholders only to satisfy the train_steps call signature —
            # uploading the full stacks would waste HBM for arrays the fed
            # step never reads.
            self.images = jnp.asarray(self._images_np[:1])
            self.thermal = jnp.asarray(self._thermal_np[:1])
            if local_shard is None:
                assert self._images_np.shape[0] % self.data_shards == 0, (
                    f"{self._images_np.shape[0]} images do not split evenly "
                    f"into {self.data_shards} shards — the per-shard camera "
                    "offsets would silently mis-index"
                )
        else:
            self.images = jnp.asarray(images_u8)
            self.thermal = jnp.asarray(self._thermal_np)

        rng = jax.random.PRNGKey(config.seed)
        self.state, self.tx = create_train_state(model, config, rng)
        if mesh is not None:
            # Explicit placement: params/opt-state replicated, except hash
            # tables which shard over an optional "model" axis (SURVEY §2c).
            from thermo_tpu.parallel.mesh import shard_params_for_mesh

            self.state = shard_params_for_mesh(mesh, self.state)
        if self.data_shards > 1:
            assert config.train_num_rays_per_batch % self.data_shards == 0
            self.train_steps_fed = make_train_step_fed(model, self.tx, config, mesh)
            self.train_steps = self._fed_train_steps
            self._fed_step: Optional[int] = None  # host-side step mirror
        else:
            self.train_steps = make_train_step(model, self.tx, config, mesh)
        # Late-training sample-count annealing (config.anneal_step > 0): a
        # SECOND jitted step over the same params pytree (sample counts do
        # not touch any parameter shape) with reduced per-ray sample counts.
        # Compiled lazily (or AOT-precompiled under a max_seconds budget so
        # the mid-run switch costs no budget time — see train()).
        self._annealed_steps: Optional[Callable] = None
        if config.anneal_step:
            assert self.data_shards == 1, (
                "sample-count annealing is not wired into the host-fed "
                "multi-host path"
            )
            mc = dataclasses.replace(
                model.config,
                num_proposal_samples_per_ray=(
                    tuple(config.anneal_proposal_samples)
                    if config.anneal_proposal_samples is not None
                    else model.config.num_proposal_samples_per_ray
                ),
                num_nerf_samples_per_ray=(
                    config.anneal_nerf_samples
                    if config.anneal_nerf_samples is not None
                    else model.config.num_nerf_samples_per_ray
                ),
            )
            annealed_model = ThermoNerfModel(
                mc, model.aabb, model.num_train_images
            )
            self._annealed_steps = make_train_step(
                annealed_model, self.tx, config, mesh
            )
        self.logs: list[TrainLog] = []
        self.early_stop: Optional[dict] = None  # set when early stopping fires
        # Train-time viewer attach (round-5): ``viewer_params`` holds a
        # COPIED params snapshot (never the live donated buffers — the
        # jitted step donates its state, so a concurrent reader of
        # state.params could hit a deleted buffer). Initialized by
        # refresh_viewer_params(); once non-None, the train loop refreshes
        # it at every log boundary.
        self.viewer_params: Optional[Any] = None
        self._eval_batch_fn = None
        self._eval_data = None

    def refresh_viewer_params(self) -> Any:
        """Snapshot current params for a concurrently-serving viewer."""
        self.viewer_params = jax.tree_util.tree_map(jnp.copy, self.state.params)
        return self.viewer_params

    # ------------------------------------------------------------------
    # host-disjoint data path (data_shards > 1)
    # ------------------------------------------------------------------
    def _sample_shard(self, step: int, shard: int) -> tuple:
        """Deterministic per-(step, shard) pixel sample from that shard's
        image range. Seeding depends only on (config.seed, step, shard) —
        NOT on the process layout — so any partitioning of shards across
        processes reproduces the same global batch."""
        rays = self.config.train_num_rays_per_batch // self.data_shards
        rng = np.random.default_rng((self.config.seed, step, shard))
        if self.local_shard is None:
            n_global = self._images_np.shape[0]
            per = n_global // self.data_shards
            lo = shard * per
            imgs, therm = (
                self._images_np[lo : lo + per],
                self._thermal_np[lo : lo + per],
            )
        else:
            lo = self.local_shard * self._images_np.shape[0]
            imgs, therm = self._images_np, self._thermal_np
        n, h, w = imgs.shape[:3]
        img = rng.integers(0, n, rays)
        py = rng.integers(0, h, rays)
        px = rng.integers(0, w, rays)
        gt_rgb = imgs[img, py, px].astype(np.float32) / 255.0
        gt_t = therm[img, py, px].astype(np.float32) / 255.0
        return (
            (img + lo).astype(np.int32), py.astype(np.int32),
            px.astype(np.int32), gt_rgb, gt_t,
        )

    def _host_batches(self, step0: int) -> tuple:
        """Stack steps_per_jit_loop batches, shards concatenated in global
        shard order (locally: only the owned shard's slice)."""
        owned = (
            range(self.data_shards) if self.local_shard is None else [self.local_shard]
        )
        loops = []
        for s in range(self.config.steps_per_jit_loop):
            parts = [self._sample_shard(step0 + s, h) for h in owned]
            loops.append([np.concatenate(cols) for cols in zip(*parts)])
        stacked = [np.stack(cols) for cols in zip(*loops)]  # [L, R_local, ...]
        if jax.process_count() > 1 and self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            def globalize(x):
                spec = PartitionSpec(None, "data", *([None] * (x.ndim - 2)))
                global_shape = (
                    x.shape[0],
                    x.shape[1] * self.data_shards // len(list(owned)),
                    *x.shape[2:],
                )
                return jax.make_array_from_process_local_data(
                    NamedSharding(self.mesh, spec), x, global_shape
                )

            return tuple(globalize(x) for x in stacked)
        return tuple(jnp.asarray(x) for x in stacked)

    def _fed_train_steps(self, state, images, thermal, cameras):
        """train_steps-compatible wrapper over the fed step (host-side
        sampling). ``images``/``thermal`` args are ignored — data comes from
        the host-local numpy shard. The step counter is mirrored host-side
        (synced from the device once, then advanced by steps_per_jit_loop)
        so batch sampling never blocks on the in-flight device loop — the
        device fetch would otherwise serialize host sampling with compute.
        The mirror is invalidated by ``restore`` (and lazily re-synced if
        callers swap ``state`` externally with a different step)."""
        del images, thermal
        if self._fed_step is None:
            self._fed_step = int(state.step)
        batch = self._host_batches(self._fed_step)
        self._fed_step += self.config.steps_per_jit_loop
        return self.train_steps_fed(state, cameras, *batch)

    @property
    def step(self) -> int:
        return int(self.state.step)

    def restore(self, saved: Any) -> None:
        """Resume from a checkpointed state dict (params/opt_state and,
        when present, step/steps_since_update/rng) — the TPU equivalent of
        nerfstudio's load_dir/load_step resume (SURVEY §5)."""
        as_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        # orbax restores optax NamedTuple states as plain dicts; rebuild the
        # live structure from the (order-preserved) leaves.
        live_leaves, treedef = jax.tree_util.tree_flatten(self.state.opt_state)
        saved_leaves = jax.tree_util.tree_leaves(saved["opt_state"])
        if len(saved_leaves) != len(live_leaves):
            raise ValueError(
                f"checkpoint opt_state has {len(saved_leaves)} leaves, "
                f"expected {len(live_leaves)} (optimizer config changed?)"
            )
        opt_state = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(v) for v in saved_leaves]
        )
        self.state = TrainState(
            params=as_jnp(saved["params"]),
            opt_state=opt_state,
            step=jnp.asarray(saved.get("step", 0), jnp.int32),
            steps_since_update=jnp.asarray(
                saved.get("steps_since_update", 0), jnp.int32
            ),
            rng=(
                jnp.asarray(saved["rng"])
                if "rng" in saved
                else jax.random.fold_in(jax.random.PRNGKey(self.config.seed), 2)
            ),
        )
        if self.data_shards > 1:
            self._fed_step = None  # re-sync the host-side step mirror

    def set_eval_data(
        self,
        cameras: Cameras,
        images_u8: np.ndarray,
        thermal_u8: Optional[np.ndarray],
    ) -> None:
        """Enable periodic eval batches (steps_per_eval_batch=500 in the
        reference configs): a random eval-pixel batch is forwarded in eval
        mode and its PSNR / per-modality MSE logged as eval_* metrics."""
        model = self.model
        use_thermal = model.config.mode in ("thermal", "concat")
        num_rays = self.config.eval_num_rays_per_batch

        # NOTE: the eval-batch PSNR is computed on the raw eval-mode
        # composite (no background blend) against the raw GT — the train
        # loss path additionally applies blend_background_for_loss. For the
        # opaque ThermoScenes GTs and the last_sample/none backgrounds used
        # here the blend is the identity, so the numbers agree; stated for
        # the record (round-3 review, weak #6).
        @jax.jit
        def eval_batch(params, rng, images, thermal, cams):
            k_img, k_y, k_x = jax.random.split(rng, 3)
            n, h, w = images.shape[0], images.shape[1], images.shape[2]
            img = jax.random.randint(k_img, (num_rays,), 0, n)
            py = jax.random.randint(k_y, (num_rays,), 0, h)
            px = jax.random.randint(k_x, (num_rays,), 0, w)
            gt_rgb = images[img, py, px].astype(jnp.float32) / 255.0
            rays = generate_rays(cams, img, py, px)
            out = model.forward(params, rays, None, train=False)
            pred = out["rgb"][..., :3]
            mse = jnp.mean(jnp.square(pred - gt_rgb))
            metrics = {
                "eval_rgb_loss": mse,
                "eval_psnr": -10.0 * jnp.log10(jnp.maximum(mse, 1e-12)),
            }
            if use_thermal and "thermal" in out:
                gt_t = thermal[img, py, px].astype(jnp.float32) / 255.0
                metrics["eval_thermal"] = jnp.mean(
                    jnp.square(out["thermal"] - gt_t)
                )
            return metrics

        eval_thermal = (
            jnp.asarray(thermal_u8)
            if thermal_u8 is not None
            else jnp.zeros((*images_u8.shape[:3], 1), jnp.uint8)
        )
        self._eval_batch_fn = eval_batch
        self._eval_data = (cameras, jnp.asarray(images_u8), eval_thermal)

    def run_eval_batch(self) -> dict[str, float]:
        assert self._eval_batch_fn is not None and self._eval_data is not None
        cams, images, thermal = self._eval_data
        rng = jax.random.fold_in(self.state.rng, 999)
        metrics = self._eval_batch_fn(self.state.params, rng, images, thermal, cams)
        return {k: float(v) for k, v in metrics.items()}

    def train(
        self,
        max_iterations: Optional[int] = None,
        checkpoint_cb: Optional[Callable[[int, TrainState], None]] = None,
        max_seconds: Optional[float] = None,
        early_stop_patience: int = 0,
    ) -> list[TrainLog]:
        """Drive the jitted loop.

        Step count is tracked host-side so the loop never blocks on the
        device between sync points; metrics are materialized (a real host
        fetch — the only reliable synchronization on tunneled TPU runtimes)
        only at log/checkpoint boundaries, letting XLA pipeline the scanned
        step calls in between.

        ``max_seconds``: optional wall-clock training budget (iso-wall-clock
        ablations). The clock starts AFTER the first jitted call returns
        (compile excluded — a one-off equal for all variants) and every call
        is synchronized with a host fetch so elapsed time tracks device
        progress, not the dispatch queue.

        ``early_stop_patience``: stop when the eval-batch quality metric
        (eval_thermal when present, else eval_rgb_loss) fails to improve for
        this many CONSECUTIVE eval batches, restoring the best-seen params
        (round-4 overfit wall: past the eval minimum, extra steps actively
        hurt). Requires ``set_eval_data``. ``self.early_stop`` records the
        stop/best step when it fires. 0 = off.

        Sample-count annealing (config.anneal_step > 0): once host_step
        crosses the threshold, the loop switches to the second compiled
        step with reduced sample counts. Under a ``max_seconds`` budget the
        annealed step is AOT-compiled BEFORE the budget clock starts, so
        variants with and without annealing compare at iso device time.
        """
        cfg = self.config
        max_iters = max_iterations or cfg.max_num_iterations
        loop = cfg.steps_per_jit_loop
        log_every = max(1, int(round(1.0 / max(cfg.metrics_logging_frequency, 1e-9))))
        host_step = int(self.state.step)
        next_log = host_step + log_every
        last_save = host_step
        next_eval = host_step + cfg.steps_per_eval_batch
        sync_t = time.perf_counter()
        sync_step = host_step
        pending_eval: dict[str, float] = {}

        if early_stop_patience:
            assert self._eval_batch_fn is not None, (
                "early_stop_patience requires set_eval_data (the stopping "
                "signal is the periodic eval batch)"
            )
        es_best = float("inf")
        es_best_step = host_step
        es_stale = 0
        es_best_params = None

        annealed_fn = self._annealed_steps
        if (
            annealed_fn is not None
            and max_seconds is not None
            and max_iters > cfg.anneal_step
        ):
            # AOT-compile so the mid-run switch costs no budget time; the
            # compiled executable is called directly (the jit cache would
            # not reuse an AOT compilation).
            annealed_fn = annealed_fn.lower(
                self.state, self.images, self.thermal, self.cameras
            ).compile()

        budget_t0: Optional[float] = None
        while host_step < max_iters:
            step_fn = (
                annealed_fn
                if annealed_fn is not None and host_step >= cfg.anneal_step
                else self.train_steps
            )
            self.state, metrics = step_fn(
                self.state, self.images, self.thermal, self.cameras
            )
            host_step += loop
            if max_seconds is not None:
                _ = float(metrics["total_loss"])  # sync (see docstring)
                now = time.perf_counter()
                if budget_t0 is None:
                    budget_t0 = now  # first call done = compile excluded
                    sync_t, sync_step = now, host_step
                elif now - budget_t0 >= max_seconds:
                    if checkpoint_cb is not None:
                        checkpoint_cb(host_step, self.state)
                    self.logs.append(TrainLog(
                        step=host_step,
                        metrics={k: float(v) for k, v in metrics.items()},
                        rays_per_sec=(
                            cfg.train_num_rays_per_batch
                            * (host_step - sync_step)
                            / max(now - sync_t, 1e-9)
                        ),
                        wall_time=time.time(),
                    ))
                    if self.log_fn is not None:
                        self.log_fn(self.logs[-1])
                    return self.logs

            if self._eval_batch_fn is not None and host_step >= next_eval:
                pending_eval = self.run_eval_batch()
                next_eval = host_step + cfg.steps_per_eval_batch
                if early_stop_patience:
                    es_key = (
                        "eval_thermal"
                        if "eval_thermal" in pending_eval
                        else "eval_rgb_loss"
                    )
                    val = pending_eval[es_key]
                    if val < es_best - 1e-12:
                        es_best, es_best_step, es_stale = val, host_step, 0
                        es_best_params = jax.tree_util.tree_map(
                            jnp.copy, self.state.params
                        )
                    else:
                        es_stale += 1
                        if es_stale >= early_stop_patience:
                            if es_best_params is not None:
                                self.state = self.state.replace(
                                    params=es_best_params
                                )
                            self.early_stop = {
                                "stopped_at_step": host_step,
                                "best_step": es_best_step,
                                "metric": es_key,
                                "best_value": es_best,
                            }
                            if checkpoint_cb is not None:
                                checkpoint_cb(host_step, self.state)
                            host_metrics = {
                                k: float(v) for k, v in metrics.items()
                            }
                            host_metrics.update(pending_eval)
                            self.logs.append(TrainLog(
                                step=host_step,
                                metrics=host_metrics,
                                rays_per_sec=0.0,
                                wall_time=time.time(),
                            ))
                            if self.log_fn is not None:
                                self.log_fn(self.logs[-1])
                            return self.logs

            if host_step >= next_log or host_step >= max_iters:
                host_metrics = {k: float(v) for k, v in metrics.items()}  # sync
                host_metrics.update(pending_eval)
                pending_eval = {}
                if self.viewer_params is not None:  # live viewer attached
                    self.refresh_viewer_params()
                now = time.perf_counter()
                rays_per_sec = (
                    cfg.train_num_rays_per_batch * (host_step - sync_step)
                    / max(now - sync_t, 1e-9)
                )
                sync_t, sync_step = now, host_step
                log = TrainLog(
                    step=host_step,
                    metrics=host_metrics,
                    rays_per_sec=rays_per_sec,
                    wall_time=time.time(),
                )
                self.logs.append(log)
                if self.log_fn is not None:
                    self.log_fn(log)
                next_log = host_step + log_every

            if checkpoint_cb is not None and (
                host_step - last_save >= cfg.steps_per_save or host_step >= max_iters
            ):
                checkpoint_cb(host_step, self.state)
                last_save = host_step
                sync_t = time.perf_counter()  # checkpoint device_get synced us
                sync_step = host_step
        return self.logs
