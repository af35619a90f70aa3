"""PackNetSAN completion eval: input_depth must flow through the eval step
(reference model_wrapper.py:291-317 feeds the full batch and
model_utils.py:97-127 flips input_depth for the TTA pass).

Round-1 regression: make_eval_step built {"rgb": ...} only, so the rgb+lidar
eval rows (the SAN headline, BASELINE abs_rel 0.016) could not be produced.
"""

import numpy as np
import jax
import pytest

from packnet_sfm_tpu.core.config import get_default_config
from packnet_sfm_tpu.engine.factory import make_optimizer, setup_metrics_config, setup_model
from packnet_sfm_tpu.engine.train import TrainState, make_eval_step, replicate_state
from packnet_sfm_tpu.models.sfm import init_model
from packnet_sfm_tpu.ops.image import flip_lr
from packnet_sfm_tpu.parallel.mesh import make_mesh


B, H, W = 2, 32, 64


@pytest.fixture(scope="module")
def setup():
    cfg = get_default_config()
    cfg.model.name = "SemiSupCompletionModel"
    cfg.model.depth_net.name = "PackNetSAN01"
    cfg.model.depth_net.version = "1A"
    cfg.model.pose_net.name = "PoseNet"
    cfg.model.loss.supervised_loss_weight = 1.0  # completion: no pose needed
    cfg.model.loss.flip_lr_prob = 0.0
    model = setup_model(cfg.model)
    assert model.pose_net is None  # w==1 drops the pose net
    assert "input_depth" in model.input_keys

    rng = np.random.default_rng(7)
    img = rng.uniform(size=(B, H, W, 3)).astype(np.float32)
    gt = (5.0 + 60.0 * rng.uniform(size=(B, H, W, 1))).astype(np.float32)
    lidar_mask = rng.uniform(size=(B, H, W, 1)) < 0.15
    batch = {
        "rgb": img,
        "input_depth": (gt * lidar_mask).astype(np.float32),
        "depth": gt,
        "intrinsics": np.broadcast_to(
            np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]],
                     np.float32), (B, 3, 3)).copy(),
    }
    mesh = make_mesh(num_devices=1)
    variables = init_model(model, jax.random.PRNGKey(0), batch)
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 100)
    state = replicate_state(TrainState.create(variables, tx), mesh)
    eval_step = make_eval_step(model, mesh, setup_metrics_config(cfg))
    return model, state, eval_step, batch


def test_rgb_and_rgbd_eval_rows(setup):
    """Both eval modes run; per-sample rows are finite; lidar changes them."""
    _, state, eval_step, batch = setup
    out_rgbd = eval_step(state, batch)
    rgb_only = {k: v for k, v in batch.items() if k != "input_depth"}
    out_rgb = eval_step(state, rgb_only)
    for out in (out_rgbd, out_rgb):
        for mode in ("depth", "depth_pp", "depth_gt", "depth_pp_gt"):
            rows = np.asarray(out[mode])
            assert rows.shape == (B, 7)
            assert np.isfinite(rows).all()
    # the lidar branch must actually reach the graph
    diff = np.abs(np.asarray(out_rgbd["inv_depth"]) -
                  np.asarray(out_rgb["inv_depth"])).max()
    assert diff > 1e-6


def test_flip_tta_mirrors_input_depth(setup):
    """Mirror symmetry: evaluating the mirrored batch (rgb AND input_depth
    flipped) must mirror the post-processed prediction exactly. Fails if the
    TTA half forgets to flip input_depth (model_utils.py:113-116)."""
    _, state, eval_step, batch = setup
    out = eval_step(state, batch)
    flipped = dict(batch)
    for k in ("rgb", "input_depth", "depth"):
        flipped[k] = np.asarray(flip_lr(batch[k]))
    out_f = eval_step(state, flipped)
    np.testing.assert_allclose(
        np.asarray(out_f["inv_depth"]),
        np.asarray(flip_lr(out["inv_depth"])), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out_f["depth_pp"]), np.asarray(out["depth_pp"]), atol=1e-4)
