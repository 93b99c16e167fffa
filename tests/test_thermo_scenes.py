"""ThermoScenes tooling tests: pure-Python FLIR extraction against the real
MSX fixtures (reference tests/data/process_thermal/msx), CustomFlir output
layout (mirrors reference test_process_thermal.py:25-72), rescaling math,
COLMAP binary model round-trip, temperature visualiser."""

import json
import struct
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

MSX_DIR = Path("/root/reference/tests/data/process_thermal/msx")

pytestmark_flir = pytest.mark.skipif(
    not MSX_DIR.exists(), reason="reference MSX fixtures unavailable"
)


@pytestmark_flir
class TestFlirExtraction:
    def test_extract_fields(self):
        from thermo_scenes_tpu.flir import extract_flir

        flir = extract_flir(MSX_DIR / "IMG_0620.JPG")
        assert flir.raw.shape == (640, 480)
        assert flir.raw.dtype == np.uint16
        assert flir.visible is not None and flir.visible.shape[2] == 3
        # plausible outdoor temperatures, not byte-swapped garbage
        assert -60 < flir.thermal_c.min() < flir.thermal_c.max() < 150
        assert abs(float(np.median(flir.thermal_c))) < 60

    def test_calibration_constants(self):
        from thermo_scenes_tpu.flir import extract_flir

        c = extract_flir(MSX_DIR / "IMG_0620.JPG").calibration
        assert 0.5 < c.emissivity <= 1.0
        assert 1000 < c.planck_b < 2000  # typical LWIR microbolometer
        assert c.planck_r2 > 0

    def test_raw2temp_monotonic(self):
        from thermo_scenes_tpu.flir import extract_flir, raw2temp

        c = extract_flir(MSX_DIR / "IMG_0620.JPG").calibration
        raws = np.array([10000, 12000, 14000], np.float64)
        temps = raw2temp(raws, c)
        assert temps[0] < temps[1] < temps[2]


@pytestmark_flir
class TestCustomFlir:
    def test_output_layout(self, tmp_path):
        """Mirrors reference test_process_thermal.py: 2 RGB + 2 thermal PNGs,
        2 CSVs, 1 bounds JSON, consistent stems."""
        from thermo_scenes_tpu.custom_flir import CustomFlir

        out = tmp_path / "out"
        flir = CustomFlir(MSX_DIR, out)
        rgbs = sorted((out / "rgb").glob("*.png"))
        thermals = sorted((out / "thermal").glob("*.png"))
        csvs = sorted((out / "csv").glob("*.csv"))
        assert len(rgbs) == 2 and len(thermals) == 2 and len(csvs) == 2
        assert (out / "temperature_bounds.json").exists()
        assert [p.stem for p in rgbs] == [p.stem for p in thermals]
        bounds = json.loads((out / "temperature_bounds.json").read_text())
        assert (
            bounds["absolute_min_temperature"] < bounds["absolute_max_temperature"]
        )
        # normalized thermal PNG spans the full range across the dataset
        vals = np.concatenate(
            [np.asarray(Image.open(p)).reshape(-1) for p in thermals]
        )
        assert vals.min() == 0 and vals.max() == 255


class TestRescale:
    def test_identity_when_same_bounds(self):
        from thermo_scenes_tpu.scripts.rescale_thermal_images import scale_test_to_train

        img = Image.fromarray((np.random.default_rng(0).uniform(size=(8, 8)) * 255).astype(np.uint8))
        out = scale_test_to_train(img, 0.0, 30.0, 0.0, 30.0)
        # reference semantics truncate (astype uint8), so allow 1 LSB
        diff = np.abs(np.asarray(out).astype(int) - np.asarray(img).astype(int))
        assert diff.max() <= 1

    def test_narrower_target_clips(self):
        from thermo_scenes_tpu.scripts.rescale_thermal_images import scale_test_to_train

        img = Image.fromarray(np.full((4, 4), 255, np.uint8))
        out = np.asarray(scale_test_to_train(img, 0.0, 40.0, 0.0, 20.0))
        assert out.max() == 255  # 40degC clipped into [0,20] range -> 1.0


class TestUpdateColmapJson:
    def test_adds_thermal_paths(self, tmp_path):
        from thermo_scenes_tpu.update_colmap_json import update_colmap_json

        meta = {"frames": [{"file_path": "images/frame_001.png"}]}
        (tmp_path / "transforms.json").write_text(json.dumps(meta))
        update_colmap_json(tmp_path)
        out = json.loads((tmp_path / "transforms.json").read_text())
        assert out["frames"][0]["thermal_file_path"] == "thermal/frame_001.png"


class TestColmapModel:
    def _write_model(self, d: Path):
        # cameras.bin: one OPENCV camera
        with open(d / "cameras.bin", "wb") as f:
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<iiQQ", 1, 4, 640, 480))
            f.write(struct.pack("<8d", 500.0, 500.0, 320.0, 240.0, 0.01, -0.01, 0.0, 0.0))
        # images.bin: two images, identity-ish poses
        with open(d / "images.bin", "wb") as f:
            f.write(struct.pack("<Q", 2))
            for i, name in [(1, b"b.png"), (2, b"a.png")]:
                f.write(struct.pack("<i", i))
                f.write(struct.pack("<dddd", 1.0, 0.0, 0.0, 0.0))
                f.write(struct.pack("<ddd", 0.1 * i, 0.0, 1.0))
                f.write(struct.pack("<i", 1))
                f.write(name + b"\x00")
                f.write(struct.pack("<Q", 0))

    def test_colmap_to_json(self, tmp_path):
        from thermo_scenes_tpu.colmap_utils import colmap_to_json

        self._write_model(tmp_path)
        n = colmap_to_json(tmp_path, tmp_path)
        assert n == 2
        meta = json.loads((tmp_path / "transforms.json").read_text())
        assert meta["fl_x"] == 500.0 and meta["k1"] == 0.01
        assert meta["frames"][0]["file_path"] == "images/a.png"  # sorted by name
        assert "applied_transform" in meta
        m = np.asarray(meta["frames"][0]["transform_matrix"])
        assert m.shape == (4, 4)


class TestVisualiser:
    def test_update_temperature(self):
        import matplotlib

        matplotlib.use("Agg")
        from thermo_scenes_tpu.thermal_visualiser import ThermalVisualiser

        vis = ThermalVisualiser(np.zeros((4, 4)), max_temperature=30.0, min_temperature=10.0)
        assert vis.update_temperature(0.0) == 10.0
        assert vis.update_temperature(1.0) == 30.0
        assert abs(vis.update_temperature(0.5) - 20.0) < 1e-9
