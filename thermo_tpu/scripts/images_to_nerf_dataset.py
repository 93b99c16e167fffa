"""COLMAP dataset creation (thin wrapper).

Equivalent of thermo_nerf/scripts/images_to_nerf_dataset.py:11-19 — the
thermo_nerf-side alias of the ThermoScenes COLMAP pipeline.
"""

from thermo_scenes_tpu.scripts.images_to_nerf_dataset import cli, main  # noqa: F401

if __name__ == "__main__":
    cli()
