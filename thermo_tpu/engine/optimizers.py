"""Per-group optimizers + LR schedules.

TPU-native equivalent of nerfstudio ``engine/optimizers.py`` /
``engine/schedulers.py`` as configured at config_thermal_nerf.py:32-45:
Adam(lr, eps) with exponential decay lr_init -> lr_final over max_steps,
one transform per parameter group ("proposal_networks", "fields",
"camera_opt"), combined with ``optax.multi_transform``.

Matches nerfstudio's ExponentialDecayScheduler: lr(t) =
lr_init * (lr_final/lr_init)^(step/max_steps), clamped at lr_final.

A "camera_opt" param group without an explicit optimizer config gets the
nerfstudio default camera-opt group (Adam 6e-4, eps 1e-8, wd 1e-2 -> 6e-6) —
mirroring nerfstudio's fallback for configs (like thermal-nerf's,
config_thermal_nerf.py) that enable pose optimization without declaring the
group.
"""

from __future__ import annotations

from typing import Any

import jax
import optax

from thermo_tpu.configs.base import OptimizerGroupConfig

DEFAULT_CAMERA_OPT_GROUP = OptimizerGroupConfig(
    lr=6e-4, eps=1e-8, weight_decay=1e-2, lr_final=6e-6, max_steps=200000
)


def make_lr_schedule(cfg: OptimizerGroupConfig) -> optax.Schedule:
    if cfg.lr_final is None or cfg.lr_final == cfg.lr:
        return optax.constant_schedule(cfg.lr)
    return optax.exponential_decay(
        init_value=cfg.lr,
        transition_steps=cfg.max_steps,
        decay_rate=cfg.lr_final / cfg.lr,
        end_value=cfg.lr_final,
    )


def make_group_transform(cfg: OptimizerGroupConfig) -> optax.GradientTransformation:
    schedule = make_lr_schedule(cfg)
    if cfg.weight_decay > 0:
        return optax.adamw(
            learning_rate=schedule, eps=cfg.eps, weight_decay=cfg.weight_decay
        )
    return optax.adam(learning_rate=schedule, eps=cfg.eps)


def make_optimizer(
    optimizer_configs: dict[str, OptimizerGroupConfig], params: Any
) -> optax.GradientTransformation:
    """Build a multi_transform keyed by the params pytree's TOP-LEVEL group
    names. Groups present in params but not configured are frozen
    (set_to_zero) — except "camera_opt", which falls back to the nerfstudio
    default (see module docstring)."""
    configs = dict(optimizer_configs)
    transforms: dict[str, optax.GradientTransformation] = {}
    for group in params.keys():
        if group in configs:
            transforms[group] = make_group_transform(configs[group])
        elif group == "camera_opt":
            transforms[group] = make_group_transform(DEFAULT_CAMERA_OPT_GROUP)
        else:
            transforms[group] = optax.set_to_zero()
    labels = {group: group for group in params.keys()}
    return optax.multi_transform(transforms, labels)
