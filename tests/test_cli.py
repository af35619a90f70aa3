"""CLI end-to-end tests: train -> checkpoint -> eval/infer/odometry."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    """Train 1 tiny synthetic epoch via the train CLI entry and return the
    checkpoint directory."""
    from tests.test_trainer import synthetic_config
    from packnet_sfm_tpu.engine.trainer import Trainer

    tmp = tmp_path_factory.mktemp("cli")
    cfg = synthetic_config(tmp, max_epochs=1)
    t = Trainer(cfg)
    t.fit()
    ckpts = os.listdir(cfg.checkpoint.filepath)
    assert ckpts
    return os.path.join(cfg.checkpoint.filepath, sorted(ckpts)[-1])


class TestEvalCLI:
    def test_evaluate_from_checkpoint(self, trained_ckpt):
        from packnet_sfm_tpu.cli.eval import evaluate

        results = evaluate(trained_ckpt)
        assert len(results) == 1
        for mode in ("depth", "depth_pp", "depth_gt", "depth_pp_gt"):
            assert np.isfinite(results[0][mode]).all()


class TestInferCLI:
    def test_infer_single_image(self, trained_ckpt, tmp_path):
        from packnet_sfm_tpu.cli.infer import infer_and_save

        rng = np.random.default_rng(0)
        img_path = str(tmp_path / "frame.png")
        Image.fromarray((rng.uniform(size=(32, 64, 3)) * 255).astype(np.uint8)
                        ).save(img_path)
        out_path = str(tmp_path / "out.png")
        infer_and_save(trained_ckpt, img_path, out_path,
                       image_shape=(32, 64))
        assert os.path.exists(str(tmp_path / "out.png"))

    def test_infer_npz(self, trained_ckpt, tmp_path):
        from packnet_sfm_tpu.cli.infer import infer_and_save
        from packnet_sfm_tpu.utils.save import load_depth

        rng = np.random.default_rng(1)
        img_path = str(tmp_path / "frame.png")
        Image.fromarray((rng.uniform(size=(32, 64, 3)) * 255).astype(np.uint8)
                        ).save(img_path)
        out_path = str(tmp_path / "depth.npz")
        infer_and_save(trained_ckpt, img_path, out_path,
                       image_shape=(32, 64), save="npz")
        d = load_depth(str(tmp_path / "depth.npz"))
        assert d.shape == (32, 64) and np.isfinite(d).all()


class TestOdometryCLI:
    def test_trajectory_over_frames(self, trained_ckpt, tmp_path):
        from packnet_sfm_tpu.cli.odometry import run_odometry
        from packnet_sfm_tpu.egomotion.evaluation import load_kitti_odometry_poses

        rng = np.random.default_rng(2)
        frames_dir = tmp_path / "frames"
        os.makedirs(frames_dir)
        base = (rng.uniform(size=(32, 64, 3)) * 255).astype(np.uint8)
        for k in range(5):
            Image.fromarray(np.roll(base, k * 2, axis=1)).save(
                frames_dir / f"{k:06d}.png")
        out = str(tmp_path / "poses.txt")
        traj = run_odometry(trained_ckpt, str(frames_dir), output=out,
                            image_shape=(32, 64), refine_ba=True, window=5)
        assert traj.shape == (5, 4, 4)
        loaded = load_kitti_odometry_poses(out)
        np.testing.assert_allclose(loaded, traj, atol=1e-6)
