"""Dataset tests against a fabricated on-disk mini-KITTI tree."""

import os

import numpy as np
import pytest
from PIL import Image

from packnet_sfm_tpu.datasets.kitti import KITTIDataset
from packnet_sfm_tpu.datasets.loader import make_transform
from packnet_sfm_tpu.core.config import get_default_config


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    """Build a minimal KITTI raw tree: drive with 6 frames, calib, oxts,
    velodyne npz depth for the left camera."""
    root = tmp_path_factory.mktemp("KITTI_raw")
    date = "2011_09_26"
    drive = f"{date}_drive_0001_sync"
    img_dir = root / date / drive / "image_02" / "data"
    oxts_dir = root / date / drive / "oxts" / "data"
    depth_dir = root / date / drive / "proj_depth" / "velodyne" / "image_02"
    for d in (img_dir, oxts_dir, depth_dir):
        os.makedirs(d)

    rng = np.random.default_rng(0)
    h, w = 48, 64
    for i in range(6):
        arr = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:010d}.png")
        # oxts: lat, lon, alt, roll, pitch, yaw + 24 zeros
        vals = [49.0 + i * 1e-5, 8.43 + i * 2e-5, 110.0 + 0.01 * i,
                0.01 * i, 0.02, 0.5 + 0.001 * i] + [0.0] * 24
        np.savetxt(oxts_dir / f"{i:010d}.txt", [vals], delimiter=" ")
        depth = rng.uniform(0, 80, size=(h, w)).astype(np.float32)
        depth[depth < 40] = 0
        np.savez_compressed(depth_dir / f"{i:010d}.npz", velodyne_depth=depth)

    calib = root / date
    P = "7.215377e+02 0.000000e+00 6.095593e+02 0.000000e+00 " \
        "0.000000e+00 7.215377e+02 1.728540e+02 0.000000e+00 " \
        "0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00"
    R = "9.999239e-01 9.837760e-03 -7.445048e-03 -9.869795e-03 9.999421e-01 -4.278459e-03 7.402527e-03 4.351614e-03 9.999631e-01"
    with open(calib / "calib_cam_to_cam.txt", "w") as f:
        f.write(f"P_rect_02: {P}\nP_rect_03: {P}\nR_rect_00: {R}\n")
    with open(calib / "calib_velo_to_cam.txt", "w") as f:
        f.write(f"R: {R}\nT: -4.069766e-03 -7.631618e-02 -2.717806e-01\n")
    with open(calib / "calib_imu_to_velo.txt", "w") as f:
        f.write(f"R: {R}\nT: -8.086759e-01 3.195559e-01 -7.997231e-01\n")

    split = root / "split.txt"
    with open(split, "w") as f:
        for i in range(6):
            f.write(f"{date}/{drive}/image_02/data/{i:010d}.png\n")
    return root, split


class TestKITTI:
    def test_basic_sample(self, kitti_root):
        root, split = kitti_root
        ds = KITTIDataset(str(root), str(split), depth_type="velodyne")
        assert len(ds) == 6
        s = ds[0]
        assert s["rgb"].shape == (48, 64, 3)
        assert s["rgb"].dtype == np.float32
        assert s["intrinsics"].shape == (3, 3)
        assert np.isclose(s["intrinsics"][0, 0], 721.5377)
        assert s["depth"].shape == (48, 64, 1)

    def test_context_discovery(self, kitti_root):
        root, split = kitti_root
        ds = KITTIDataset(str(root), str(split), depth_type="velodyne",
                          back_context=1, forward_context=1)
        # frames 0 and 5 lack context -> 4 samples
        assert len(ds) == 4
        s = ds[0]
        assert len(s["rgb_context"]) == 2
        assert s["rgb_context"][0].shape == (48, 64, 3)

    def test_pose_chain(self, kitti_root):
        root, split = kitti_root
        ds = KITTIDataset(str(root), str(split), depth_type="velodyne",
                          with_pose=True, back_context=1, forward_context=1)
        s = ds[1]
        assert s["pose"].shape == (4, 4)
        assert len(s["pose_context"]) == 2
        for T in s["pose_context"]:
            # small relative motion, valid SE(3)
            np.testing.assert_allclose(
                T[:3, :3] @ T[:3, :3].T, np.eye(3), atol=1e-5)
            assert np.linalg.norm(T[:3, 3]) < 10.0

    def test_train_transform_pipeline(self, kitti_root):
        """Host-jitter (reference-semantics) train transform path."""
        root, split = kitti_root
        aug = get_default_config().datasets.augmentation
        aug.image_shape = (32, 48)
        aug.device_jitter = False
        tfm = make_transform("train", aug, seed=1)
        ds = KITTIDataset(str(root), str(split), depth_type="velodyne",
                          back_context=1, forward_context=1, data_transform=tfm)
        s = ds[0]
        assert s["rgb"].shape == (32, 48, 3)
        assert "rgb_original" in s and s["rgb_original"].shape == (32, 48, 3)
        assert len(s["rgb_context_original"]) == 2
        assert s["depth"].shape == (32, 48, 1)
        # jitter changed rgb but not original
        assert not np.allclose(s["rgb"], s["rgb_original"])
        # intrinsics rescaled
        assert s["intrinsics"][0, 0] < 721.0

    def test_train_transform_device_jitter_schema(self, kitti_root):
        """Default (TPU-native) train transform: uint8 images + per-sample
        jitter factors; duplication/jitter happen in-graph
        (engine/train.prepare_train_batch)."""
        root, split = kitti_root
        aug = get_default_config().datasets.augmentation
        aug.image_shape = (32, 48)
        assert aug.device_jitter  # the documented default
        tfm = make_transform("train", aug, seed=1)
        ds = KITTIDataset(str(root), str(split), depth_type="velodyne",
                          back_context=1, forward_context=1, data_transform=tfm)
        s = ds[0]
        assert s["rgb"].dtype == np.uint8 and s["rgb"].shape == (32, 48, 3)
        assert all(c.dtype == np.uint8 for c in s["rgb_context"])
        assert "rgb_original" not in s
        assert s["jitter"].shape == (4,) and s["jitter"].dtype == np.float32
        # factors drawn from the configured ranges, not identity
        b, c, sat, h = s["jitter"]
        assert 0.8 <= b <= 1.2 and 0.8 <= c <= 1.2 and abs(h) <= 0.05
        # depth untouched by the image path
        assert s["depth"].dtype == np.float32

    def test_transform_deterministic_per_index(self, kitti_root):
        root, split = kitti_root
        aug = get_default_config().datasets.augmentation
        aug.image_shape = (32, 48)
        tfm = make_transform("train", aug, seed=1)
        ds = KITTIDataset(str(root), str(split), depth_type="velodyne",
                          data_transform=tfm)
        a, b = ds[2], ds[2]
        np.testing.assert_array_equal(a["rgb"], b["rgb"])


def _mixed_size_tree(tmp_path_factory):
    """KITTI tree with three drives of DIFFERENT native sizes (mirrors
    eigen_test's 1242/1241/1226 width mix), 3 frames each."""
    root = tmp_path_factory.mktemp("KITTI_mixed")
    date = "2011_09_26"
    rng = np.random.default_rng(1)
    P = "7.215377e+02 0.000000e+00 6.095593e+02 0.000000e+00 " \
        "0.000000e+00 7.215377e+02 1.728540e+02 0.000000e+00 " \
        "0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00"
    R = ("9.999239e-01 9.837760e-03 -7.445048e-03 -9.869795e-03 "
         "9.999421e-01 -4.278459e-03 7.402527e-03 4.351614e-03 9.999631e-01")
    calib = root / date
    os.makedirs(calib, exist_ok=True)
    with open(calib / "calib_cam_to_cam.txt", "w") as f:
        f.write(f"P_rect_02: {P}\nP_rect_03: {P}\nR_rect_00: {R}\n")
    lines = []
    sizes = [(48, 64), (48, 60), (40, 64)]
    for di, (h, w) in enumerate(sizes):
        drive = f"{date}_drive_{di:04d}_sync"
        img_dir = root / date / drive / "image_02" / "data"
        depth_dir = root / date / drive / "proj_depth" / "velodyne" / "image_02"
        os.makedirs(img_dir)
        os.makedirs(depth_dir)
        for i in range(3):
            arr = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(img_dir / f"{i:010d}.png")
            depth = rng.uniform(1, 80, size=(h, w)).astype(np.float32)
            depth[rng.uniform(size=(h, w)) < 0.6] = 0
            np.savez_compressed(depth_dir / f"{i:010d}.npz",
                                velodyne_depth=depth)
            lines.append(f"{date}/{drive}/image_02/data/{i:010d}.png")
    split = root / "split.txt"
    with open(split, "w") as f:
        f.write("\n".join(lines) + "\n")
    return root, split, sizes


class TestMixedNativeSizeEval:
    """Batched eval on mixed native gt sizes (VERDICT r2 next-7): the eval
    loader buckets by sample_shape so batch>1 works on eigen_test-style
    mixed-width data, with metrics equal to the B=1 oracle."""

    def test_loader_buckets_by_shape(self, tmp_path_factory):
        from packnet_sfm_tpu.datasets.loader import DataLoader

        root, split, sizes = _mixed_size_tree(tmp_path_factory)
        aug = get_default_config().datasets.augmentation
        aug.image_shape = (32, 48)
        tfm = make_transform("test", aug, seed=1)
        ds = KITTIDataset(str(root), str(split), train=False,
                          depth_type="velodyne", data_transform=tfm)
        assert len(ds) == 9
        assert ds.sample_shape(0) == (48, 64) and ds.sample_shape(8) == (40, 64)
        ld = DataLoader(ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=1, process_index=0, process_count=1)
        covered = []
        nb = 0
        for b in ld.epoch(0):
            nb += 1
            assert b["rgb"].shape[0] == 2          # batched!
            assert b["depth"].ndim == 4            # homogeneous stack worked
            bsz = len(b["idx"]) - int(b.get("pad_count", 0))
            covered.extend(np.asarray(b["idx"][:bsz]).tolist())
        assert nb == len(ld) == 6                  # ceil(3/2) per bucket x 3
        assert sorted(covered) == list(range(9))

    @pytest.mark.slow
    def test_batched_metrics_equal_b1_oracle(self, tmp_path_factory):
        from packnet_sfm_tpu.core.config import parse_train_config
        from packnet_sfm_tpu.datasets.loader import DataLoader
        from packnet_sfm_tpu.engine.trainer import Trainer, EVAL_MODES

        root, split, _ = _mixed_size_tree(tmp_path_factory)
        c = get_default_config()
        c.arch.max_epochs = 1
        c.model.name = "SelfSupModel"
        c.model.depth_net.name = "DepthResNet"
        c.model.depth_net.version = "18"
        c.model.pose_net.name = "PoseNet"
        c.model.loss.flip_lr_prob = 0.0
        c.datasets.augmentation.image_shape = (32, 64)
        for mode in ("train", "validation", "test"):
            d = c.datasets[mode]
            d.dataset = ["KITTI"]
            d.path = [str(root)]
            d.split = [str(split)]
            d.depth_type = ["velodyne"]
            d.batch_size = 8
            d.num_workers = 1
            d.back_context = 0
            d.forward_context = 0
        cfg = parse_train_config(c)
        t = Trainer(cfg)
        first = next(iter(t.train_loaders[0].epoch(0)))
        t.init_state(first)
        res_batched = t.validate(0)[0]

        # Oracle: every sample individually (batch 1, unsharded)
        ds = t.val_datasets[0]
        n = len(ds)
        rows = {m: np.zeros((n, 7)) for m in EVAL_MODES}
        for i in range(n):
            s = ds[i]
            batch = {"rgb": s["rgb"][None], "depth": s["depth"][None],
                     "intrinsics": s["intrinsics"][None]}
            out = t.eval_step(t.state, batch)
            for m in EVAL_MODES:
                rows[m][i] = np.asarray(out[m])[0]
        for m in EVAL_MODES:
            np.testing.assert_allclose(
                res_batched[m], rows[m].mean(axis=0), atol=2e-4, err_msg=m)
