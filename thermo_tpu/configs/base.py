"""Layered dataclass configs.

TPU-native equivalent of nerfstudio's TrainerConfig tree as instantiated by
the reference (config_thermal_nerf.py:17-48, config_nerfacto.py:14-53,
config_concat_nerfacto.py:18-56): plain dataclasses with JSON round-trip
(instead of yaml-pickled class tags) so checkpoints are portable and the
Renderer can reconstruct a pipeline from an experiment directory
(renderer.py:49-62 equivalent).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

from thermo_tpu.data.dataparser import DataparserConfig
from thermo_tpu.models.thermal_nerf import ModelConfig, ProposalNetArgs


@dataclasses.dataclass(frozen=True)
class OptimizerGroupConfig:
    """AdamOptimizerConfig + ExponentialDecaySchedulerConfig for one param
    group (config_thermal_nerf.py:32-45)."""

    lr: float = 1e-2
    eps: float = 1e-15
    weight_decay: float = 0.0
    lr_final: Optional[float] = 1e-4
    max_steps: int = 200000


@dataclasses.dataclass
class TrainerConfig:
    """Top-level method config (nerfstudio TrainerConfig equivalent)."""

    method_name: str = "thermal-nerf"
    experiment_name: str = "experiment"
    output_dir: Path = Path("outputs")
    max_num_iterations: int = 30000
    steps_per_eval_batch: int = 500
    steps_per_save: int = 2000
    save_only_latest_checkpoint: bool = True
    mixed_precision: bool = True  # bf16 compute dtype on TPU
    train_num_rays_per_batch: int = 4096
    eval_num_rays_per_batch: int = 4096
    eval_num_rays_per_chunk: int = 1 << 16
    viewer_num_rays_per_chunk: int = 1 << 15
    steps_per_jit_loop: int = 10  # lax.scan'd steps per host dispatch
    seed: int = 42
    # Late-training sample-count annealing (round-5): once step >=
    # anneal_step, training switches to a second compiled step with the
    # reduced per-ray sample counts below — the one traffic-cutting lever
    # that touches no encoding (PERFORMANCE.md roadmap #6). The proposal
    # hierarchy has localized the surfaces by then, so fewer samples carry
    # the same signal at proportionally less gather/scatter traffic. Eval
    # rendering keeps the full counts. 0 = off.
    anneal_step: int = 0
    anneal_proposal_samples: Optional[tuple[int, ...]] = None
    anneal_nerf_samples: Optional[int] = None
    metrics_logging_frequency: float = 0.0075  # pipeline_tracking.py:16-17
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    dataparser: DataparserConfig = dataclasses.field(default_factory=DataparserConfig)
    optimizers: dict[str, OptimizerGroupConfig] = dataclasses.field(
        default_factory=lambda: {
            "proposal_networks": OptimizerGroupConfig(),
            "fields": OptimizerGroupConfig(),
        }
    )

    # ------------------------------------------------------------------
    # JSON round-trip (config snapshot saved next to checkpoints)
    # ------------------------------------------------------------------
    def to_json(self) -> str:
        def default(o):
            if dataclasses.is_dataclass(o) and not isinstance(o, type):
                d = dataclasses.asdict(o)
                d["__type__"] = type(o).__name__
                return d
            if isinstance(o, Path):
                return str(o)
            if isinstance(o, tuple):
                return list(o)
            raise TypeError(f"not serializable: {type(o)}")

        d = dataclasses.asdict(self)
        d["__type__"] = "TrainerConfig"
        return json.dumps(d, indent=2, default=default)

    @classmethod
    def from_json(cls, text: str) -> "TrainerConfig":
        d = json.loads(text)
        d.pop("__type__", None)
        model_d = d.pop("model")
        model_d.pop("__type__", None)
        pn = model_d.pop("proposal_net_args_list", None)
        if pn is not None:
            model_d["proposal_net_args_list"] = tuple(
                ProposalNetArgs(**{k: v for k, v in a.items() if k != "__type__"})
                for a in pn
            )
        for k in ("num_proposal_samples_per_ray",):
            if k in model_d and isinstance(model_d[k], list):
                model_d[k] = tuple(model_d[k])
        dp_d = d.pop("dataparser")
        dp_d.pop("__type__", None)
        dp_d["data"] = Path(dp_d["data"])
        opt_d = d.pop("optimizers")
        optimizers = {
            k: OptimizerGroupConfig(**{kk: vv for kk, vv in v.items() if kk != "__type__"})
            for k, v in opt_d.items()
        }
        d["output_dir"] = Path(d["output_dir"])
        if isinstance(d.get("anneal_proposal_samples"), list):
            d["anneal_proposal_samples"] = tuple(d["anneal_proposal_samples"])
        return cls(
            model=ModelConfig(**model_d),
            dataparser=DataparserConfig(**dp_d),
            optimizers=optimizers,
            **d,
        )

    def save(self, path: Path) -> None:
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_text(self.to_json())

    @classmethod
    def load(cls, path: Path) -> "TrainerConfig":
        return cls.from_json(Path(path).read_text())

    @property
    def experiment_dir(self) -> Path:
        return Path(self.output_dir) / self.experiment_name / self.method_name
