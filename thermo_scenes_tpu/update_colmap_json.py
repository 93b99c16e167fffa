"""Add ``thermal_file_path`` to every frame of a COLMAP transforms.json.

Equivalent of thermo_scenes/update_colmap_json.py:5-24: thermal path =
``thermal/<image name>``.
"""

from __future__ import annotations

import json
from pathlib import Path


def update_colmap_json(input_folder: Path) -> None:
    input_path = Path(input_folder, "transforms.json")
    data = json.loads(input_path.read_text())
    for frame in data["frames"]:
        file_path = Path(frame["file_path"])
        frame["thermal_file_path"] = str(Path("thermal", file_path.name))
    input_path.write_text(json.dumps(data, indent=4))
