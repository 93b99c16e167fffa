"""Extract RGB + thermal + temperature bounds from FLIR MSX captures.

Equivalent of thermo_scenes/scripts/preprocess_thermal.py:9-27 (CLI wrapper
over CustomFlir).
"""

from __future__ import annotations

import argparse
from pathlib import Path

from thermo_scenes_tpu.custom_flir import CustomFlir


def cli() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--msx-images", type=Path, default=Path("data/datatest/"))
    p.add_argument("--output-folder", type=Path, default=Path("data/output_datatest"))
    a = p.parse_args()
    CustomFlir(path_to_msx_images=a.msx_images, path_to_output_folder=a.output_folder)


if __name__ == "__main__":
    cli()
