"""Per-method TrainerConfig presets.

Mirror of the reference's method registry (selected by ModelType,
train_eval_script.py:57-78):
  * ``thermal-nerf``    — config_thermal_nerf.py:17-48 (ThermalNerfModel,
                          thermal dataparser, no camera-opt group).
  * ``nerfacto-track``  — config_nerfacto.py:14-53 (plain nerfacto on
                          thermal-as-RGB data; camera-opt Adam 6e-4,
                          eps 1e-8, wd 1e-2 -> 6e-6 over 200k).
  * ``concat_nerf``     — config_concat_nerfacto.py:18-56 (RGBT head;
                          camera-opt group lr 1e-3 -> 1e-4 over 5k).
  * ``thermal-nerf-tiny`` — CPU-runnable reference config (BASELINE.json
                          config #1): tiny hash grids, 1k iters.
"""

from __future__ import annotations

from thermo_tpu.configs.base import OptimizerGroupConfig, TrainerConfig
from thermo_tpu.data.dataparser import DataparserConfig
from thermo_tpu.models.thermal_nerf import ModelConfig, ProposalNetArgs


def thermal_nerf_config() -> TrainerConfig:
    return TrainerConfig(
        method_name="thermal-nerf",
        steps_per_eval_batch=500,
        steps_per_save=2000,
        max_num_iterations=30000,
        mixed_precision=True,
        train_num_rays_per_batch=4096,
        eval_num_rays_per_batch=4096,
        eval_num_rays_per_chunk=1 << 16,
        model=ModelConfig(mode="thermal"),
        dataparser=DataparserConfig(eval_mode="filename"),
        optimizers={
            "proposal_networks": OptimizerGroupConfig(
                lr=1e-2, eps=1e-15, lr_final=1e-4, max_steps=200000
            ),
            "fields": OptimizerGroupConfig(
                lr=1e-2, eps=1e-15, lr_final=1e-4, max_steps=200000
            ),
        },
    )


def thermalnerfacto_config() -> TrainerConfig:
    return TrainerConfig(
        method_name="nerfacto-track",
        steps_per_eval_batch=500,
        steps_per_save=2000,
        max_num_iterations=30000,
        mixed_precision=True,
        eval_num_rays_per_chunk=1 << 15,
        model=ModelConfig(mode="rgb"),
        dataparser=DataparserConfig(eval_mode="filename"),
        optimizers={
            "proposal_networks": OptimizerGroupConfig(
                lr=1e-2, eps=1e-15, lr_final=1e-4, max_steps=200000
            ),
            "fields": OptimizerGroupConfig(
                lr=1e-2, eps=1e-15, lr_final=1e-4, max_steps=200000
            ),
            "camera_opt": OptimizerGroupConfig(
                lr=6e-4, eps=1e-8, weight_decay=1e-2, lr_final=6e-6, max_steps=200000
            ),
        },
    )


def concat_nerf_config() -> TrainerConfig:
    return TrainerConfig(
        method_name="concat_nerf",
        steps_per_eval_batch=500,
        steps_per_save=2000,
        max_num_iterations=30000,
        mixed_precision=True,
        eval_num_rays_per_chunk=1 << 16,
        model=ModelConfig(mode="concat"),
        dataparser=DataparserConfig(eval_mode="filename"),
        optimizers={
            "proposal_networks": OptimizerGroupConfig(
                lr=1e-2, eps=1e-15, lr_final=1e-4, max_steps=200000
            ),
            "fields": OptimizerGroupConfig(
                lr=1e-2, eps=1e-15, lr_final=1e-4, max_steps=200000
            ),
            "camera_opt": OptimizerGroupConfig(
                lr=1e-3, eps=1e-15, lr_final=1e-4, max_steps=5000
            ),
        },
    )


def thermal_nerf_tiny_config() -> TrainerConfig:
    """CPU-runnable tiny config (BASELINE.json config #1)."""
    cfg = thermal_nerf_config()
    cfg.method_name = "thermal-nerf-tiny"
    cfg.max_num_iterations = 1000
    cfg.train_num_rays_per_batch = 256
    cfg.eval_num_rays_per_chunk = 1 << 12
    cfg.mixed_precision = False
    cfg.model = ModelConfig(
        mode="thermal",
        num_levels=8,
        max_res=256,
        log2_hashmap_size=15,
        num_proposal_samples_per_ray=(64, 32),
        num_nerf_samples_per_ray=24,
        proposal_net_args_list=(
            ProposalNetArgs(num_levels=4, max_res=64, log2_hashmap_size=13),
            ProposalNetArgs(num_levels=4, max_res=128, log2_hashmap_size=13),
        ),
        compute_dtype="float32",
    )
    return cfg


def thermal_nerf_tpu_config() -> TrainerConfig:
    """TPU-throughput preset: same capability class and sampling scale as
    ``thermal-nerf`` (same sample counts, optimizer, losses, heads) with the
    encoding re-shaped around v5e's measured memory-primitive costs
    (PERFORMANCE.md):

      * proposal density fields are CP-factorized two-hot matmul encodings
        (ops/lowrank.py) — forward and backward are MXU matmuls, removing
        ALL proposal hash gathers and gradient scatters;
      * the final hash grid uses 4 levels x 8 features (same out_dim 32 and
        table budget as nerfacto's 16x2) — gather cost is per-index up to
        8-wide rows, so this cuts gather indices 4x for free;
      * hash_fwd_corners=1: the training forward evaluates each level at ONE
        Categorical(trilinear-weight)-sampled corner (unbiased feature
        estimate, 8x less gather+scatter traffic than exact; position grads
        through the final encoding are zero — pose gradients flow through
        the CP proposals, which are exact);
      * hash_grad_levels=2: each point's table gradient updates 2 of the 4
        levels, uniformly drawn, scaled x2 (unbiased, halves scatter
        traffic again).

    Measured 106.3K rays/s on v5e at 4096 rays (23x the exact step). THIS IS
    THE THROUGHPUT PRESET, and the trade is real: the round-3 iso-WALL-CLOCK
    ablation (outputs/qa_r3/ablation.json, 420s/variant on the synthetic
    scene) measured thermal PSNR 17.04 / MAE 0.094 for these knobs at 8,570
    steps vs 17.32 / 0.083 for ``thermal-nerf`` (exact) at 350 steps — the
    step-rate advantage does NOT recover the estimator bias on that budget.
    For the best measured quality-per-wall-clock use ``thermal-nerf-fast``
    (iso-time winner, ff1gl2 knobs: 18.93 / 0.065); for reference parity use
    ``thermal-nerf``. Eval rendering is exact everywhere."""
    import dataclasses

    cfg = thermal_nerf_config()
    cfg.method_name = "thermal-nerf-tpu"
    cfg.model = dataclasses.replace(
        cfg.model,
        num_levels=4,
        features_per_level=8,
        hash_fwd_corners=1,
        hash_grad_levels=2,
        proposal_net_args_list=(
            ProposalNetArgs(kind="cp", max_res=128, rank=32),
            ProposalNetArgs(kind="cp", max_res=256, rank=32),
        ),
    )
    return cfg


def thermal_nerf_fast_config() -> TrainerConfig:
    """Best measured quality-per-wall-clock preset (round-3 iso-wall-clock
    ablation, outputs/qa_r3/ablation.json): the full 16x2^19 grid and exact
    hash proposals of ``thermal-nerf`` with the stochastic-trilinear
    final-field forward plus corner/level-subsampled table gradients
    (``hash_fwd_corners=1, hash_grad_levels=2`` — the forward's corner draws
    also drive the backward, so no separate grad_corners knob). At a
    fixed 420s v5e budget this knob set beat every other variant on every
    thermal metric — psnr_thermal 18.93 / mae_thermal 0.065 vs 18.16/0.076
    for the forward-only knob and 17.32/0.083 for exact — while its
    backward table traffic is 8x lighter than forward-only (measured 8,601
    rays/s post-warmup on v5e, 1.9x exact). The aggressive
    ``thermal-nerf-tpu`` knobs (CP proposals + 4x8 grid) are an order of
    magnitude faster still but did NOT win at iso-wall-clock; they remain
    the throughput preset.

    Round-4 caveat (outputs/qa_r4): quality leadership is SCENE-DEPENDENT.
    On the sphere scene these knobs beat exact again (19.30 dB / 0.057 vs
    17.32 / 0.083 at iso-420s), but on the inverted COLD scene (warm
    background, cold object) they LOSE 2.5 dB to exact (11.53 / 0.182 vs
    13.99 / 0.141). ``thermal-nerf`` (exact) is the safe quality default on
    unfamiliar data; this preset is the measured quality-per-wall-clock
    winner on bright-object-on-dark-background content."""
    import dataclasses

    cfg = thermal_nerf_config()
    cfg.method_name = "thermal-nerf-fast"
    # NOTE: hash_grad_corners is NOT set — it is inert whenever
    # hash_fwd_corners>0 (the stochastic-forward path derives its backward
    # from the forward's corner draws; see ops/hash_encoding.hash_encode).
    cfg.model = dataclasses.replace(
        cfg.model,
        hash_fwd_corners=1,
        hash_grad_levels=2,
    )
    return cfg


def thermal_nerf_cp_config() -> TrainerConfig:
    """Ablation probe between ``thermal-nerf-fast`` and ``thermal-nerf-tpu``:
    the FULL 16x2^19 final grid with the fast preset's ff1gl2 estimator
    knobs, but CP-factorized matmul proposal fields instead of hash grids —
    isolates whether the tpu preset's quality ceiling comes from its CP
    proposals or its shrunken 4x8 final grid (outputs/qa_r3)."""
    import dataclasses

    cfg = thermal_nerf_fast_config()
    cfg.method_name = "thermal-nerf-cp"
    cfg.model = dataclasses.replace(
        cfg.model,
        proposal_net_args_list=(
            ProposalNetArgs(kind="cp", max_res=128, rank=32),
            ProposalNetArgs(kind="cp", max_res=256, rank=32),
        ),
    )
    return cfg


def thermal_nerf_mid_config() -> TrainerConfig:
    """Middle preset probe: the throughput preset's 4x8 final grid and
    ff1gl2-class estimator knobs, but STOCHASTIC-forward HASH proposal
    fields (proposal_fwd_corners=2) instead of CP matmuls — the round-3
    ablations isolated the CP factorization as the quality ceiling
    (outputs/qa_r3: cpfull/cpr128 vs ff1gl2), while stochastic hash
    proposals cost only ~+100ms-class traffic, not the exact-trilinear
    +445ms (step_attrib prop_hash_stoch2). Measured iso-420s: 17.61 dB
    thermal / 0.096 MAE at 1,760 steps — the best quality-per-STEP of any
    matmul-era variant but not iso-time-competitive with
    ``thermal-nerf-fast`` (18.93); kept as the documented middle point of
    the speed/quality Pareto."""
    import dataclasses

    cfg = thermal_nerf_tpu_config()
    cfg.method_name = "thermal-nerf-mid"
    cfg.model = dataclasses.replace(
        cfg.model,
        proposal_fwd_corners=2,
        proposal_net_args_list=(
            ProposalNetArgs(max_res=128),
            ProposalNetArgs(max_res=256),
        ),
    )
    return cfg


def thermal_nerf_tri_config() -> TrainerConfig:
    """Round-4 probe (measured, NOT promoted): the full 16x2^19 grid and
    ff1gl2 estimator knobs of ``thermal-nerf-fast`` with TRIPLANE (K-planes)
    proposal fields instead of exact hash grids (ops/triplane.py —
    non-separable matmul encoding, no gathers/scatters, 34.1k rays/s = 4x
    the fast preset). The round-4 iso-420s ablation (outputs/qa_r4/sphere)
    measured thermal PSNR 17.58 / MAE 0.090 at ~3,800 steps vs 19.30 /
    0.057 for ``thermal-nerf-fast`` at ~800 steps: even a NON-separable
    matmul proposal encoding loses to exact-trilinear hash proposals at
    iso-wall-clock — the proposal hierarchy's sample shaping, not its
    encoding capacity class, is the binding quality factor. Kept as the
    measured 34k-rays/s point of the Pareto; use ``thermal-nerf-fast`` for
    quality, ``thermal-nerf-tpu`` for throughput."""
    import dataclasses

    cfg = thermal_nerf_fast_config()
    cfg.method_name = "thermal-nerf-tri"
    cfg.model = dataclasses.replace(
        cfg.model,
        proposal_net_args_list=(
            ProposalNetArgs(kind="triplane", max_res=128, rank=8),
            ProposalNetArgs(kind="triplane", max_res=192, rank=8),
        ),
    )
    return cfg


def thermal_nerf_tri4_config() -> TrainerConfig:
    """Rank-4 probe of ``thermal-nerf-tri`` (same planes at half the
    features/plane): the triplane matmul cost scales with rank x res^2, so
    rank 4 trades encoding capacity for step rate. Measured iso-420s
    (outputs/qa_r4/sphere): 16.63 dB thermal / 0.105 MAE — strictly worse
    than rank 8 (17.58 / 0.090); triplane proposal quality is
    capacity-limited below rank 8 AND structurally behind hash proposals
    above it (see thermal_nerf_tri_config). Probe preset only."""
    import dataclasses

    cfg = thermal_nerf_tri_config()
    cfg.method_name = "thermal-nerf-tri4"
    cfg.model = dataclasses.replace(
        cfg.model,
        proposal_net_args_list=(
            ProposalNetArgs(kind="triplane", max_res=128, rank=4),
            ProposalNetArgs(kind="triplane", max_res=192, rank=4),
        ),
    )
    return cfg


def thermal_nerf_f8_config() -> TrainerConfig:
    """Round-5 lever (VERDICT r4 item 3): F8 LEVEL-PACKING of the proposal
    hash grids. ``thermal-nerf-fast``'s step is ~93% exact-trilinear
    proposal-field traffic (PERFORMANCE.md round-4 table: 476 ms/step, of
    which ~420 ms is the two proposal encodes), and that traffic is priced
    per ACCESS, not per byte: v5e gathers cost 9.8 ns for an F=2 row but
    14.9 ns for an F=8 row — 1.9 ns/element vs 4.9 (true_microbench). So
    the proposal ladders are re-packed at constant max_res and per-level
    table size into 2 levels x 8 features (vs 5 x 2; total proposal params
    grow 1.6x to 2.1M — negligible HBM, lower per-level collision rate):
    per-sample exact trilinear cost drops from 40 row-gathers (mixed F2) to
    16 F8-row gathers, and the coarse (dense) level stays on the matmul
    path. Measured 12,745 rays/s on v5e (1.48x ``thermal-nerf-fast``).

    Deviation from the verdict's literal "groups of 4 levels share a hash":
    equal-resolution hashed levels with distinct hash seeds are statistically
    one level with wider features, so the packing is implemented as a
    re-laddering (fewer, wider levels) rather than index-sharing between
    unequal resolutions — unequal-resolution levels cannot share a gather
    index without collapsing to the finest member's cells anyway. Numerics
    change (the mid-ladder resolutions 27/45/76 disappear), so the preset is
    quality-ablated like any estimator knob (outputs/qa_r5).

    The FINAL field keeps the fast preset's full 16x2^19xF2 grid and ff1gl2
    estimator knobs — the proposal repack is the only change, isolating it."""
    import dataclasses

    cfg = thermal_nerf_fast_config()
    cfg.method_name = "thermal-nerf-f8"
    # F8 eval-chunk cap: in the grad-free eval render the exact-F8
    # proposal encode's corner gather MATERIALIZES index-major on v5e —
    # f32[N*L*8, 8] tiled T(8,128) pads the minor 8 -> 128 (16x; the same
    # trap as PERFORMANCE.md "64x layout trap") = 137 GB at the default
    # 2^16-ray chunk, measured OOM (outputs/qa_r5_run.log); the training
    # step's custom-VJP/scan context keeps the same gather fused (measured
    # fine at 1.05M points/step). 2^11 rays x 256 proposal samples keeps
    # the padded tensor at ~4.3 GB.
    cfg.eval_num_rays_per_chunk = 1 << 11
    cfg.viewer_num_rays_per_chunk = 1 << 11
    cfg.model = dataclasses.replace(
        cfg.model,
        proposal_net_args_list=(
            ProposalNetArgs(num_levels=2, features_per_level=8, max_res=128),
            ProposalNetArgs(num_levels=2, features_per_level=8, max_res=256),
        ),
    )
    return cfg


def thermal_nerf_f8g_config() -> TrainerConfig:
    """``thermal-nerf-f8`` with the FINAL grid also F8-packed: 4 levels x 8
    features x 2^19 (the thermal-nerf-tpu grid — same parameter count and
    out_dim 32 as nerfacto's 16x2). With the stochastic ff1gl2 estimators
    the final grid is already cheap, so this probes the packed grid's
    QUALITY at near-equal speed rather than buying throughput; round 3
    indirectly cleared the 4x8 grid (cpfull vs tpu, outputs/qa_r3) — this
    measures it directly."""
    import dataclasses

    cfg = thermal_nerf_f8_config()
    cfg.method_name = "thermal-nerf-f8g"
    cfg.model = dataclasses.replace(
        cfg.model, num_levels=4, features_per_level=8
    )
    return cfg


def thermal_nerf_e8_config() -> TrainerConfig:
    """EXACT estimators (no stochastic knobs at all) with BOTH the proposal
    and final grids F8-packed — the deterministic counterpart of
    ``thermal-nerf-f8g``. Motivation: on cold/inverted scenes the
    stochastic estimator knobs lose ~2.5 dB (outputs/qa_r4/cold) and exact
    ``thermal-nerf`` is the quality default there, but its 899 ms step is
    ~80% hashed-level per-access traffic; F8 packing cuts exact per-element
    gather cost 2.6x and turns the 8-corner backward into column scatters
    (41 ns/8-wide vs 8x10 ns scalar). Quality-ablated on the cold scenes in
    outputs/qa_r5.

    Measured (iso-420s, 150-view/256px rich scene, v5e): 25.04 dB thermal
    at 440 steps vs exact's 24.31 at 330 — and with late sample annealing
    (--anneal-step 150 --anneal-proposal-samples 128 48
    --anneal-nerf-samples 24) **25.56 dB at 710 steps** (8.2k rays/s
    post-anneal steady state) — the promoted data-rich recipe
    (outputs/qa_r5/anneal-rich/anneal-e8-rich-rerun, PERFORMANCE.md
    round 5)."""
    import dataclasses

    cfg = thermal_nerf_config()
    cfg.method_name = "thermal-nerf-e8"
    # F8 eval-chunk cap — see thermal_nerf_f8_config
    cfg.eval_num_rays_per_chunk = 1 << 11
    cfg.viewer_num_rays_per_chunk = 1 << 11
    cfg.model = dataclasses.replace(
        cfg.model,
        num_levels=4,
        features_per_level=8,
        proposal_net_args_list=(
            ProposalNetArgs(num_levels=2, features_per_level=8, max_res=128),
            ProposalNetArgs(num_levels=2, features_per_level=8, max_res=256),
        ),
    )
    return cfg


METHOD_CONFIGS = {
    "thermal-nerf": thermal_nerf_config,
    "nerfacto-track": thermalnerfacto_config,
    "concat_nerf": concat_nerf_config,
    "thermal-nerf-tiny": thermal_nerf_tiny_config,
    "thermal-nerf-tpu": thermal_nerf_tpu_config,
    "thermal-nerf-fast": thermal_nerf_fast_config,
    "thermal-nerf-cp": thermal_nerf_cp_config,
    "thermal-nerf-mid": thermal_nerf_mid_config,
    "thermal-nerf-tri": thermal_nerf_tri_config,
    "thermal-nerf-tri4": thermal_nerf_tri4_config,
    "thermal-nerf-f8": thermal_nerf_f8_config,
    "thermal-nerf-f8g": thermal_nerf_f8g_config,
    "thermal-nerf-e8": thermal_nerf_e8_config,
}
