"""Data-layer tests: dataparser semantics (splits, sorting, auto-orient,
scaling), camera ray generation, dataset stacks — the behaviors the
reference inherits from thermal_dataparser.py and nerfstudio camera_utils."""

import json
from pathlib import Path

import numpy as np
import jax.numpy as jnp
import pytest

from thermo_scenes_tpu.synthetic import make_synthetic_scene
from thermo_tpu.data.cameras import Cameras, generate_rays
from thermo_tpu.data.dataparser import (
    DataparserConfig,
    auto_orient_and_center_poses,
    parse_transforms,
    split_filename,
    split_fraction,
    split_interval,
)
from thermo_tpu.data.dataset import load_image_stack


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    return make_synthetic_scene(tmp_path_factory.mktemp("scene"))


class TestSplits:
    def test_filename(self):
        files = [f"frame_train_{i}.png" for i in range(8)] + [
            f"frame_eval_{i}.png" for i in range(2)
        ]
        tr, ev = split_filename(files)
        assert len(tr) == 8 and len(ev) == 2

    def test_filename_raises_on_unknown(self):
        with pytest.raises(ValueError):
            split_filename(["foo.png"])

    def test_fraction(self):
        tr, ev = split_fraction(list(range(10)), 0.9)
        assert len(tr) == 9 and len(ev) == 1
        assert set(tr).isdisjoint(ev)

    def test_interval(self):
        tr, ev = split_interval(list(range(10)), 5)
        assert list(ev) == [0, 5]
        assert len(tr) == 8


class TestAutoOrient:
    def test_up_method_aligns_up_axis(self):
        rng = np.random.default_rng(0)
        poses = np.tile(np.eye(4), (5, 1, 1))
        # tilt all cameras: up = +y mixed with +z
        theta = 0.3
        tilt = np.array(
            [[1, 0, 0], [0, np.cos(theta), -np.sin(theta)], [0, np.sin(theta), np.cos(theta)]]
        )
        poses[:, :3, :3] = tilt
        poses[:, :3, 3] = rng.normal(size=(5, 3))
        oriented, tf = auto_orient_and_center_poses(poses, "up", "poses")
        up = oriented[:, :3, 1].mean(0)
        up /= np.linalg.norm(up)
        np.testing.assert_allclose(up, [0, 0, 1], atol=1e-6)
        # centered
        np.testing.assert_allclose(oriented[:, :3, 3].mean(0), 0.0, atol=1e-6)


class TestDataparser:
    def test_parse_and_split(self, scene):
        cfg = DataparserConfig(data=scene, eval_mode="filename")
        train = parse_transforms(cfg, "train")
        ev = parse_transforms(cfg, "val")
        assert len(train.image_filenames) == 10
        assert len(ev.image_filenames) == 2
        assert len(train.thermal_filenames) == 10
        # poses auto-scaled into +/- 1
        assert np.max(np.abs(train.cameras.c2w[:, :3, 3])) <= 1.0 + 1e-5
        assert train.scene_box_aabb.shape == (2, 3)

    def test_thermal_paths_match_images(self, scene):
        cfg = DataparserConfig(data=scene, eval_mode="filename")
        out = parse_transforms(cfg, "train")
        for img, th in zip(out.image_filenames, out.thermal_filenames):
            assert Path(img).stem == Path(th).stem

    def test_image_stack(self, scene):
        cfg = DataparserConfig(data=scene, eval_mode="filename")
        out = parse_transforms(cfg, "train")
        stack = load_image_stack(out)
        assert stack.images.shape == (10, 48, 48, 3)
        assert stack.thermal is not None and stack.thermal.shape == (10, 48, 48, 1)
        assert stack.images.dtype == np.uint8


class TestRayGeneration:
    def _cameras(self):
        c2w = np.tile(np.eye(4)[:3], (2, 1, 1))
        c2w[1, :3, 3] = [0, 0, 2.0]
        return Cameras.from_numpy(
            fx=[100.0, 100.0], fy=[100.0, 100.0], cx=[32.0, 32.0], cy=[32.0, 32.0],
            width=[64, 64], height=[64, 64], c2w=c2w,
        )

    def test_center_pixel_looks_down_minus_z(self):
        cams = self._cameras()
        # pixel (31, 31): + 0.5 offset hits (31.5, 31.5), slightly off center;
        # use cx-0.5 for exact center
        rays = generate_rays(
            cams,
            jnp.asarray([0]),
            jnp.asarray([31]),
            jnp.asarray([31]),
        )
        d = np.asarray(rays.directions)[0]
        assert d[2] < -0.99

    def test_origins_from_pose(self):
        cams = self._cameras()
        rays = generate_rays(cams, jnp.asarray([1]), jnp.asarray([0]), jnp.asarray([0]))
        np.testing.assert_allclose(np.asarray(rays.origins)[0], [0, 0, 2.0], atol=1e-6)

    def test_unit_norm(self):
        cams = self._cameras()
        rays = generate_rays(
            cams,
            jnp.asarray([0, 1, 0]),
            jnp.asarray([5, 20, 63]),
            jnp.asarray([3, 60, 0]),
        )
        norms = np.linalg.norm(np.asarray(rays.directions), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-6)

    def test_distortion_roundtrip(self):
        # with distortion params, undistorted coords should re-distort back
        c2w = np.tile(np.eye(4)[:3], (1, 1, 1))
        dist = np.array([[0.05, -0.01, 0.0, 0.0, 0.001, -0.001]], np.float32)
        cams = Cameras.from_numpy(
            fx=[100.0], fy=[100.0], cx=[32.0], cy=[32.0],
            width=[64], height=[64], c2w=c2w, distortion=dist,
        )
        rays = generate_rays(cams, jnp.asarray([0]), jnp.asarray([10]), jnp.asarray([50]))
        d = np.asarray(rays.directions)[0]
        # undistorted coord (x, y): dir = normalize([x, y, -1])
        x, y = -d[0] / d[2], -d[1] / d[2]
        k1, k2, k3, k4, p1, p2 = dist[0]
        r = x * x + y * y
        dd = 1 + r * (k1 + r * (k2 + r * (k3 + r * k4)))
        xd = dd * x + 2 * p1 * x * y + p2 * (r + 2 * x * x)
        yd = dd * y + 2 * p2 * x * y + p1 * (r + 2 * y * y)
        np.testing.assert_allclose(xd, (50 + 0.5 - 32.0) / 100.0, atol=1e-5)
        np.testing.assert_allclose(yd, -(10 + 0.5 - 32.0) / 100.0, atol=1e-5)


REFERENCE_TRAJ = Path("/root/reference/tests/data/trajectories/camera_path_facade_2.json")


@pytest.mark.skipif(not REFERENCE_TRAJ.exists(), reason="reference fixture unavailable")
class TestReferenceCameraPath:
    def test_load_real_fixture(self):
        """Parse the reference's committed 96-pose camera path
        (SURVEY §4 fixture) through our loader."""
        from thermo_tpu.data.camera_paths import load_camera_path

        cameras, meta = load_camera_path(REFERENCE_TRAJ)
        assert len(cameras) == 96
        assert meta["camera_type"] == "perspective"
        assert meta["seconds"] > 0
        c2w = np.asarray(cameras.c2w)
        assert c2w.shape == (96, 3, 4)
        # rotations are orthonormal
        rtr = np.einsum("nij,nkj->nik", c2w[:, :, :3], c2w[:, :, :3])
        np.testing.assert_allclose(rtr, np.tile(np.eye(3), (96, 1, 1)), atol=1e-4)
        # focal follows the three.js vertical-fov convention
        h = int(np.asarray(cameras.height)[0])
        assert np.all(np.asarray(cameras.fx) > 0)
        assert np.all(np.asarray(cameras.cx) == pytest.approx(np.asarray(cameras.width)[0] / 2))


class TestDownscaleFolders:
    """nerfstudio `images_{factor}/` + `thermal_{factor}/` layout
    (reference: thermal_dataparser.py:151-156 + inherited _get_fname)."""

    @pytest.fixture(scope="class")
    def downscaled_scene(self, tmp_path_factory):
        from PIL import Image

        root = make_synthetic_scene(tmp_path_factory.mktemp("ds_scene"), size=32)
        for src, dst in (("images", "images_2"), ("thermal", "thermal_2")):
            (root / dst).mkdir()
            for p in sorted((root / src).iterdir()):
                with Image.open(p) as img:
                    img.resize((img.width // 2, img.height // 2)).save(root / dst / p.name)
        return root

    def test_explicit_factor_resolves_folders_and_intrinsics(self, downscaled_scene):
        base = parse_transforms(DataparserConfig(data=downscaled_scene), "train")
        out = parse_transforms(
            DataparserConfig(data=downscaled_scene, downscale_factor=2), "train"
        )
        assert all("images_2" in str(p) for p in out.image_filenames)
        assert all("thermal_2" in str(p) for p in out.thermal_filenames)
        np.testing.assert_allclose(out.cameras.fx, base.cameras.fx / 2)
        np.testing.assert_allclose(out.cameras.cx, base.cameras.cx / 2)
        assert (out.cameras.width == base.cameras.width // 2).all()
        # poses/transform unaffected by downscaling
        np.testing.assert_allclose(out.cameras.c2w, base.cameras.c2w)

    def test_explicit_factor_missing_folder_raises(self, scene):
        with pytest.raises(FileNotFoundError, match="images_4"):
            parse_transforms(DataparserConfig(data=scene, downscale_factor=4), "train")

    def test_auto_discovery_picks_existing_folder(self, downscaled_scene, tmp_path):
        # auto mode consults the metadata resolution: claim a >1600px source
        # so discovery should step down into the existing images_2/.
        meta = json.loads((downscaled_scene / "transforms.json").read_text())
        meta["w"], meta["h"] = 3200, 2400
        scene2 = tmp_path / "auto_scene"
        scene2.mkdir()
        for item in downscaled_scene.iterdir():
            if item.name != "transforms.json":
                (scene2 / item.name).symlink_to(item)
        (scene2 / "transforms.json").write_text(json.dumps(meta))
        out = parse_transforms(
            DataparserConfig(data=scene2, downscale_factor=None), "train"
        )
        assert all("images_2" in str(p) for p in out.image_filenames)

    def test_auto_discovery_small_images_stay_full_res(self, scene):
        out = parse_transforms(
            DataparserConfig(data=scene, downscale_factor=None), "train"
        )
        assert all("images_2" not in str(p) for p in out.image_filenames)
