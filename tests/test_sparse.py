"""Sparse branch tests: masked conv semantics + PackNetSAN end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from packnet_sfm_tpu.nn.sparse import (
    SparseConvBlock,
    SparseDepthEncoder,
    masked_max_pool,
    sparsify_depth,
)
from packnet_sfm_tpu.nn.packnet_san import PackNetSAN01


def sparse_depth(rng, b=1, h=32, w=32, density=0.1):
    d = rng.uniform(1.0, 80.0, size=(b, h, w, 1)).astype(np.float32)
    mask = rng.uniform(size=(b, h, w, 1)) < density
    return (d * mask).astype(np.float32)


class TestSparseOps:
    def test_sparsify(self):
        d = np.array([[[[0.0], [2.0]], [[3.0], [0.0]]]], np.float32)
        feats, mask = sparsify_depth(jnp.asarray(d))
        np.testing.assert_array_equal(np.asarray(mask)[0, :, :, 0], [[0, 1], [1, 0]])

    def test_masked_max_pool_ignores_invalid(self):
        x = np.zeros((1, 4, 4, 1), np.float32)
        m = np.zeros((1, 4, 4, 1), np.float32)
        x[0, 1, 1, 0], m[0, 1, 1, 0] = -5.0, 1.0  # valid negative value
        out, mask = masked_max_pool(jnp.asarray(x), jnp.asarray(m))
        assert np.asarray(mask)[0, 0, 0, 0] == 1.0
        assert np.asarray(out)[0, 0, 0, 0] == -5.0  # not clobbered by invalid 0s

    def test_block_output_masked(self):
        rng = np.random.default_rng(0)
        d = sparse_depth(rng)
        feats, mask = sparsify_depth(jnp.asarray(d))
        block = SparseConvBlock(8, 5, stride=2)
        vs = block.init(jax.random.PRNGKey(0), feats, mask, train=False)
        _, out, new_mask = block.apply(vs, feats, mask, train=False)
        out, new_mask = np.asarray(out), np.asarray(new_mask)
        assert out.shape == (1, 16, 16, 8)
        # inactive sites must be exactly zero
        assert np.all(out[new_mask[..., 0] == 0] == 0)

    def test_conv_only_sees_active_sites(self):
        """Invalid-site feature values must not leak into outputs."""
        rng = np.random.default_rng(1)
        d = sparse_depth(rng)
        feats, mask = sparsify_depth(jnp.asarray(d))
        poisoned = jnp.where(mask > 0, feats, 777.0)  # garbage at invalid sites
        block = SparseConvBlock(4, 3, stride=1)
        vs = block.init(jax.random.PRNGKey(0), feats, mask, train=False)
        _, a, _ = block.apply(vs, feats, mask, train=False)
        _, b, _ = block.apply(vs, poisoned, mask, train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_encoder_pyramid_shapes(self):
        rng = np.random.default_rng(2)
        d = sparse_depth(rng, h=64, w=64)
        enc = SparseDepthEncoder(channels=(32, 64, 128, 256, 512))
        vs = enc.init(jax.random.PRNGKey(0), jnp.asarray(d), train=False)
        outs = enc.apply(vs, jnp.asarray(d), train=False)
        shapes = [o.shape for o in outs]
        assert shapes == [(1, 32, 32, 32), (1, 16, 16, 64), (1, 8, 8, 128),
                          (1, 4, 4, 256), (1, 2, 2, 512)]


class TestPackNetSAN:
    def test_eval_rgb_only(self):
        net = PackNetSAN01()
        rgb = jnp.zeros((1, 64, 64, 3))
        vs = net.init(jax.random.PRNGKey(0), rgb, train=False)
        out = net.apply(vs, rgb, train=False)
        assert len(out["inv_depths"]) == 4
        assert out["inv_depths"][0].shape == (1, 64, 64, 1)

    def test_train_dual_pass(self):
        rng = np.random.default_rng(3)
        net = PackNetSAN01()
        rgb = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
        d = jnp.asarray(sparse_depth(rng, h=64, w=64))
        vs = net.init(jax.random.PRNGKey(0), rgb, d, train=True)
        out = net.apply(vs, rgb, d, train=True,
                        mutable=["batch_stats"])[0]
        assert "inv_depths" in out and "inv_depths_rgbd" in out
        assert np.isfinite(float(out["depth_loss"]))
        # depth branch must change predictions
        diff = np.abs(np.asarray(out["inv_depths"][0]) -
                      np.asarray(out["inv_depths_rgbd"][0])).max()
        assert diff > 0


class TestSemiSupCompletion:
    def test_model_loss(self):
        from packnet_sfm_tpu.core.config import get_default_config
        from packnet_sfm_tpu.engine.factory import setup_model
        from packnet_sfm_tpu.models.sfm import init_model, model_loss

        cfg = get_default_config()
        cfg.model.name = "SemiSupCompletionModel"
        cfg.model.depth_net.name = "PackNetSAN01"
        cfg.model.depth_net.version = "1A"
        cfg.model.pose_net.name = "PoseNet"
        cfg.model.loss.flip_lr_prob = 0.0
        cfg.model.loss.supervised_loss_weight = 0.9
        model = setup_model(cfg.model)

        rng = np.random.default_rng(4)
        b, h, w = 2, 64, 64
        img = rng.uniform(size=(b, h, w, 3)).astype(np.float32)
        K = np.broadcast_to(np.array(
            [[40.0, 0, 31.5], [0, 40.0, 31.5], [0, 0, 1]], np.float32), (b, 3, 3))
        batch = {
            "rgb": img, "rgb_original": img.copy(),
            "rgb_context": [img.copy(), img.copy()],
            "rgb_context_original": [img.copy(), img.copy()],
            "intrinsics": np.ascontiguousarray(K),
            "depth": sparse_depth(rng, b=b, h=h, w=w, density=0.3),
            "input_depth": sparse_depth(rng, b=b, h=h, w=w, density=0.05),
        }
        variables = init_model(model, jax.random.PRNGKey(0), batch)
        loss, (metrics, out, updates) = model_loss(
            model, variables, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))
        assert "supervised_loss_rgbd" in metrics
        assert "depth_loss" in metrics
