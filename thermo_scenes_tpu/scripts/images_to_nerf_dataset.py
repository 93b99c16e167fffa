"""Process image sequences into a thermal NeRF dataset via COLMAP.

Equivalent of thermo_scenes/scripts/images_to_nerf_dataset.py:17-64 (and the
nerfstudio ImagesToNerfstudioDataset it wraps): copy train+eval RGB images
into ``<output>/images``, run COLMAP SfM, convert the model to
transforms.json, add ``thermal_file_path`` per frame, and copy the thermal
images into ``<output>/thermal``.
"""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path

from thermo_scenes_tpu.colmap_utils import colmap_to_json, run_colmap
from thermo_scenes_tpu.update_colmap_json import update_colmap_json


def main(
    output_dir: Path,
    data: Path | None = None,
    eval_data: Path | None = None,
    thermo_scene_data: Path | None = None,
    do_update_colmap_json: bool = True,
) -> None:
    if thermo_scene_data is not None:
        data = Path(thermo_scene_data, "rgb_train_processed")
        eval_data = Path(thermo_scene_data, "rgb_eval_processed")
    if data is None:
        raise RuntimeError("data and thermo_scene_data cannot both be None")

    output_dir = Path(output_dir)
    image_dir = output_dir / "images"
    image_dir.mkdir(parents=True, exist_ok=True)
    for src_dir in filter(None, [data, eval_data]):
        for img in sorted(Path(src_dir).iterdir()):
            shutil.copy(img, image_dir / img.name)

    recon = run_colmap(image_dir, output_dir / "colmap")
    num = colmap_to_json(recon, output_dir)
    print(f"COLMAP registered {num} frames")

    if do_update_colmap_json:
        update_colmap_json(input_folder=output_dir)

    if thermo_scene_data is None:
        return
    thermal_path = output_dir / "thermal"
    thermal_path.mkdir(exist_ok=True, parents=True)
    for sub in ("thermal_train_processed", "thermal_eval_processed"):
        src = Path(thermo_scene_data, sub)
        if src.exists():
            for thermal_image in sorted(src.iterdir()):
                shutil.copy(thermal_image, thermal_path)


def cli() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output-dir", type=Path, required=True)
    p.add_argument("--data", type=Path, default=None)
    p.add_argument("--eval-data", type=Path, default=None)
    p.add_argument("--thermo-scene-data", type=Path, default=None)
    p.add_argument("--no-update-colmap-json", action="store_true")
    a = p.parse_args()
    main(a.output_dir, a.data, a.eval_data, a.thermo_scene_data,
         not a.no_update_colmap_json)


if __name__ == "__main__":
    cli()
