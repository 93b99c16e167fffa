"""Dataset rewrite for the thermal-as-RGB nerfacto baseline.

Equivalent of thermo_nerf/thermal_as_rgb.py:8-20: copy the dataset directory
and point every frame's ``file_path`` at its ``thermal_file_path`` so plain
nerfacto trains on thermal images as if they were RGB
(train_eval_script.py:84-87 pre-step for ModelType.THERMALNERFACTO).
"""

from __future__ import annotations

import json
import os
import shutil
import stat
from pathlib import Path


def thermal_as_rgb(thermal_dataset: Path, rgb_dataset: Path) -> None:
    shutil.copytree(src=rgb_dataset, dst=thermal_dataset)
    os.chmod(thermal_dataset / "transforms.json", stat.S_IRWXU)
    config = json.loads((thermal_dataset / "transforms.json").read_text())
    for frame in config["frames"]:
        frame["file_path"] = frame["thermal_file_path"]
    (thermal_dataset / "transforms.json").write_text(json.dumps(config, indent=4))
