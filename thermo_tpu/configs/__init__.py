"""Method configs (the TPU-native equivalent of the reference's L6 registry:
config_thermal_nerf.py / config_nerfacto.py / config_concat_nerfacto.py)."""

from thermo_tpu.configs.base import OptimizerGroupConfig, TrainerConfig
from thermo_tpu.configs.methods import (
    METHOD_CONFIGS,
    concat_nerf_config,
    thermal_nerf_config,
    thermal_nerf_tiny_config,
    thermalnerfacto_config,
)

__all__ = [
    "OptimizerGroupConfig",
    "TrainerConfig",
    "METHOD_CONFIGS",
    "concat_nerf_config",
    "thermal_nerf_config",
    "thermal_nerf_tiny_config",
    "thermalnerfacto_config",
]
