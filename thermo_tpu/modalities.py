"""Rendered image modalities + model types.

Equivalent of thermo_nerf/rendered_image_modalities.py:4-9 and
thermo_nerf/model_type.py:4-8.
"""

from __future__ import annotations

import enum


class RenderedImageModality(str, enum.Enum):
    RGB = "img"
    DEPTH = "depth"
    ACCUMULATION = "accumulation"
    THERMAL = "thermal"
    THERMAL_COMBINED = "thermal_combined"


class ModelType(str, enum.Enum):
    THERMALNERFACTO = "thermal-nerfacto"  # plain nerfacto trained on thermal-as-RGB
    THERMONERF = "thermal-nerf"
    CONCATNERF = "concat-nerf"
    NERFACTO = "nerfacto"
