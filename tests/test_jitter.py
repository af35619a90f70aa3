"""On-device jitter (ops/jitter.py + engine/train.prepare_train_batch):
parity with the host path and the uint8 batch contract.

The host path (augmentations._jitter_image) is the reference-semantics
oracle; the device path must match it exactly for hue=0 (identical fused
algebra in f32) and within the hue-bin quantization bound otherwise (host
rotates a 180-bin uint8 HSV wheel, device rotates continuous float HSV).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from packnet_sfm_tpu.datasets.augmentations import _jitter_image, draw_jitter_params
from packnet_sfm_tpu.ops.jitter import apply_jitter, hsv_to_rgb, rgb_to_hsv


def _images(n=2, h=16, w=24, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(size=(n, h, w, 3)).astype(np.float32)


class TestHsvRoundtrip:
    def test_identity(self):
        x = _images()
        back = np.asarray(hsv_to_rgb(rgb_to_hsv(jnp.asarray(x))))
        np.testing.assert_allclose(back, x, atol=1e-5)

    def test_matches_colorsys(self):
        import colorsys
        rng = np.random.default_rng(3)
        for _ in range(20):
            r, g, b = rng.uniform(size=3)
            h, s, v = colorsys.rgb_to_hsv(r, g, b)
            got = np.asarray(rgb_to_hsv(jnp.asarray([[[r, g, b]]],
                                                    jnp.float32)))[0, 0]
            np.testing.assert_allclose(got, [h, s, v], atol=1e-5)


class TestDeviceJitterParity:
    def test_exact_parity_no_hue(self):
        imgs = _images(3)
        params = np.array([[1.15, 0.9, 1.1, 0.0],
                           [0.85, 1.2, 0.8, 0.0],
                           [1.0, 1.0, 1.0, 0.0]], np.float32)
        dev = np.asarray(apply_jitter(jnp.asarray(imgs), jnp.asarray(params)))
        for i in range(3):
            host = _jitter_image(imgs[i], *params[i])
            np.testing.assert_allclose(dev[i], host, atol=2e-5)

    def test_parity_with_hue_within_bin_bound(self):
        imgs = _images(2, seed=5)
        params = np.array([[1.1, 0.95, 1.05, 0.04],
                           [0.9, 1.1, 0.9, -0.03]], np.float32)
        dev = np.asarray(apply_jitter(jnp.asarray(imgs), jnp.asarray(params)))
        for i in range(2):
            host = _jitter_image(imgs[i], *params[i])
            # host quantizes to the 180-bin uint8 HSV wheel (plus u8 V/S
            # quantization); bound the drift and require close agreement
            # in the mean
            assert np.abs(dev[i] - host).max() < 0.12
            assert np.abs(dev[i] - host).mean() < 0.015

    def test_identity_params_are_noop(self):
        imgs = _images(2, seed=9)
        ident = np.tile(np.array([[1.0, 1.0, 1.0, 0.0]], np.float32), (2, 1))
        out = np.asarray(apply_jitter(jnp.asarray(imgs), jnp.asarray(ident)))
        np.testing.assert_allclose(out, np.clip(imgs, 0, 1), atol=1e-5)

    def test_draw_params_distribution(self):
        rng = np.random.default_rng(0)
        draws = np.stack([draw_jitter_params((0.2, 0.2, 0.2, 0.05), rng)
                          for _ in range(200)])
        assert draws[:, 0].min() >= 0.8 and draws[:, 0].max() <= 1.2
        assert np.abs(draws[:, 3]).max() <= 0.05
        assert draws.std(axis=0).min() > 0.01  # actually random


class TestPrepareTrainBatch:
    def _u8_batch(self, with_jitter=True):
        rng = np.random.default_rng(1)
        b = {
            "rgb": (rng.uniform(size=(2, 16, 24, 3)) * 255).astype(np.uint8),
            "rgb_context": [
                (rng.uniform(size=(2, 16, 24, 3)) * 255).astype(np.uint8)
                for _ in range(2)],
            "intrinsics": np.eye(3, dtype=np.float32)[None].repeat(2, 0),
        }
        if with_jitter:
            b["jitter"] = np.array([[1.1, 0.9, 1.05, 0.02],
                                    [0.95, 1.1, 0.9, -0.04]], np.float32)
        return b

    def test_uint8_jitter_batch(self):
        from packnet_sfm_tpu.engine.train import prepare_train_batch
        raw = self._u8_batch()
        out = prepare_train_batch({k: (jnp.asarray(v) if not isinstance(v, list)
                                       else [jnp.asarray(x) for x in v])
                                   for k, v in raw.items()})
        assert "jitter" not in out
        assert out["rgb"].dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(out["rgb_original"]),
            raw["rgb"].astype(np.float32) / 255.0, atol=1e-6)
        # jittered != original, contexts jittered with the same factors
        assert not np.allclose(np.asarray(out["rgb"]),
                               np.asarray(out["rgb_original"]))
        exp = apply_jitter(jnp.asarray(raw["rgb_context"][0].astype(np.float32) / 255.0),
                           jnp.asarray(raw["jitter"]))
        np.testing.assert_allclose(np.asarray(out["rgb_context"][0]),
                                   np.asarray(exp), atol=1e-6)

    def test_uint8_no_jitter_duplicates(self):
        from packnet_sfm_tpu.engine.train import prepare_train_batch
        raw = self._u8_batch(with_jitter=False)
        out = prepare_train_batch({k: (jnp.asarray(v) if not isinstance(v, list)
                                       else [jnp.asarray(x) for x in v])
                                   for k, v in raw.items()})
        np.testing.assert_array_equal(np.asarray(out["rgb"]),
                                      np.asarray(out["rgb_original"]))
        assert len(out["rgb_context_original"]) == 2

    def test_float_passthrough(self):
        from packnet_sfm_tpu.engine.train import prepare_train_batch
        b = {"rgb": jnp.zeros((2, 8, 8, 3), jnp.float32)}
        assert prepare_train_batch(b) is b


def test_train_step_device_jitter_end_to_end():
    """A full train step on a uint8 device-jitter batch must run, produce a
    finite decreasing-capable loss, and equal the HOST-jitter path's loss to
    f32 rounding when the factors agree (hue=0; the two paths share the
    fused-affine algebra exactly)."""
    import jax

    from packnet_sfm_tpu.engine.factory import make_optimizer, setup_model
    from packnet_sfm_tpu.engine.train import (
        TrainState, make_train_step, zero_metrics)
    from packnet_sfm_tpu.core.config import get_default_config
    from packnet_sfm_tpu.models.sfm import init_model
    from packnet_sfm_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(0)
    b, h, w = 2, 32, 64
    u8 = (rng.uniform(size=(b, h, w, 3)) * 255).astype(np.uint8)
    ctx = [(rng.uniform(size=(b, h, w, 3)) * 255).astype(np.uint8)
           for _ in range(2)]
    K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]],
                 np.float32)[None].repeat(b, 0)
    params = np.array([[1.1, 0.9, 1.05, 0.0],
                       [0.9, 1.1, 0.95, 0.0]], np.float32)

    cfg = get_default_config()
    cfg.model.name = "SelfSupModel"
    cfg.model.depth_net.name = "DepthResNet"
    cfg.model.depth_net.version = "18"
    cfg.model.pose_net.name = "PoseNet"
    model = setup_model(cfg.model)
    mesh = make_mesh(1)

    dev_batch = {"rgb": u8, "rgb_context": ctx, "intrinsics": K,
                 "jitter": params}
    # host-path equivalent: pre-jittered float with originals
    f = lambda x: x.astype(np.float32) / 255.0
    host_batch = {
        "rgb": np.stack([_jitter_image(f(u8[i]), *params[i])
                         for i in range(b)]),
        "rgb_original": f(u8),
        "rgb_context": [np.stack([_jitter_image(f(c[i]), *params[i])
                                  for i in range(b)]) for c in ctx],
        "rgb_context_original": [f(c) for c in ctx],
        "intrinsics": K,
    }

    variables = init_model(model, jax.random.PRNGKey(0), dev_batch)
    # the step donates its state; snapshot to host so each run gets fresh
    # device arrays
    variables = jax.tree_util.tree_map(np.asarray, variables)
    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler,
                        steps_per_epoch=10)
    step = make_train_step(model, tx, mesh)

    losses = []
    for batch in (dev_batch, host_batch):
        state = TrainState.create(variables, tx, rng=jax.random.PRNGKey(7))
        _, acc = step(state, zero_metrics(), batch)
        losses.append(float(acc["loss"][0]))
    assert np.isfinite(losses[0])
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-4)
