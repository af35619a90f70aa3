"""DDAD (DGP-format) reader tests against a fabricated scene tree."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from packnet_sfm_tpu.datasets.ddad import DDADDataset, project_pointcloud_to_depth


@pytest.fixture(scope="module")
def ddad_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("DDAD")
    scene_dir = root / "000001"
    cams = ["CAMERA_01", "CAMERA_05"]
    lidar = "LIDAR"
    n_frames = 4
    h, w = 32, 48
    rng = np.random.default_rng(0)

    os.makedirs(scene_dir / "calibration")
    for cam in cams:
        os.makedirs(scene_dir / "rgb" / cam)
    os.makedirs(scene_dir / "point_cloud" / lidar)

    data, samples = [], []
    for k in range(n_frames):
        keys = []
        for cam in cams:
            fn = f"rgb/{cam}/{k:015d}.png"
            arr = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(scene_dir / fn)
            key = f"{cam}_{k}"
            data.append({
                "key": key,
                "datum": {"image": {
                    "channel": cam,
                    "filename": fn,
                    "pose": {"translation": {"x": 0.1 * k, "y": 0.0, "z": 0.0},
                             "rotation": {"qw": 1, "qx": 0, "qy": 0, "qz": 0}},
                }},
            })
            keys.append(key)
        pc_fn = f"point_cloud/{lidar}/{k:015d}.npz"
        pts = rng.uniform(-5, 5, size=(200, 3)).astype(np.float32)
        pts[:, 2] = rng.uniform(2, 30, size=200)
        np.savez_compressed(scene_dir / pc_fn, point_cloud=pts)
        key = f"{lidar}_{k}"
        data.append({"key": key, "datum": {"point_cloud": {
            "channel": lidar, "filename": pc_fn,
        }}})
        keys.append(key)
        samples.append({"datum_keys": keys})

    calib = {
        "names": cams + [lidar],
        "intrinsics": [{"fx": 30.0, "fy": 30.0, "cx": w / 2, "cy": h / 2}
                       for _ in cams] + [{}],
        "extrinsics": [{"translation": {"x": 0, "y": 0, "z": 0},
                        "rotation": {"qw": 1, "qx": 0, "qy": 0, "qz": 0}}] * 3,
    }
    with open(scene_dir / "calibration" / "calib.json", "w") as f:
        json.dump(calib, f)
    with open(scene_dir / "scene_abc.json", "w") as f:
        json.dump({"data": data, "samples": samples}, f)
    return str(root)


class TestDDAD:
    def test_single_camera(self, ddad_root):
        ds = DDADDataset(ddad_root, cameras=["CAMERA_01"], depth_type="LIDAR")
        assert len(ds) == 4
        s = ds[0]
        assert s["rgb"].shape == (32, 48, 3)
        assert s["intrinsics"][0, 0] == 30.0
        assert s["depth"].shape == (32, 48, 1)
        assert (s["depth"] > 0).sum() > 0  # some lidar points projected

    def test_multicam_stacking(self, ddad_root):
        ds = DDADDataset(ddad_root, cameras=["CAMERA_01", "CAMERA_05"],
                         depth_type="LIDAR")
        s = ds[0]
        assert s["rgb"].shape == (2, 32, 48, 3)
        assert s["intrinsics"].shape == (2, 3, 3)
        assert s["depth"].shape == (2, 32, 48, 1)

    def test_context_and_pose(self, ddad_root):
        ds = DDADDataset(ddad_root, cameras=["CAMERA_01"], depth_type="LIDAR",
                         with_pose=True, back_context=1, forward_context=1)
        assert len(ds) == 2  # frames 1 and 2
        s = ds[0]
        assert len(s["rgb_context"]) == 2
        assert len(s["pose_context"]) == 2
        # camera moves +0.1m in x per frame; context poses are relative
        np.testing.assert_allclose(
            abs(s["pose_context"][0][0, 3]), 0.1, atol=1e-6)

    def test_depth_cache_written(self, ddad_root):
        ds = DDADDataset(ddad_root, cameras=["CAMERA_01"], depth_type="LIDAR")
        _ = ds[1]
        import glob
        caches = glob.glob(os.path.join(
            ddad_root, "*", "point_cloud", "LIDAR", "*depth_CAMERA_01.npz"))
        assert caches, "expected cached depth projections"

    def test_multicam_batch_folding(self, ddad_root):
        from packnet_sfm_tpu.datasets.loader import DataLoader
        from packnet_sfm_tpu.models.batch_utils import stack_multicam_batch

        ds = DDADDataset(ddad_root, cameras=["CAMERA_01", "CAMERA_05"],
                         depth_type="LIDAR")
        dl = DataLoader(ds, batch_size=2, num_workers=1,
                        process_index=0, process_count=1)
        batch = next(iter(dl.epoch(0)))
        assert batch["rgb"].shape == (2, 2, 32, 48, 3)
        folded = stack_multicam_batch(batch)
        assert folded["rgb"].shape == (4, 32, 48, 3)
        assert folded["intrinsics"].shape == (4, 3, 3)


class TestPointcloudProjection:
    def test_known_point(self):
        K = np.array([[10.0, 0, 16], [0, 10.0, 12], [0, 0, 1]])
        pts = np.array([[1.0, 0.5, 5.0]])
        depth = project_pointcloud_to_depth(pts, np.eye(4), K, 24, 32)
        u = int(10 * 1.0 / 5.0 + 16)
        v = int(10 * 0.5 / 5.0 + 12)
        assert depth[v, u, 0] == pytest.approx(5.0)

    def test_nearest_point_wins(self):
        K = np.array([[10.0, 0, 16], [0, 10.0, 12], [0, 0, 1]])
        pts = np.array([[0.0, 0.0, 5.0], [0.0, 0.0, 3.0]])
        depth = project_pointcloud_to_depth(pts, np.eye(4), K, 24, 32)
        assert depth[12, 16, 0] == pytest.approx(3.0)
