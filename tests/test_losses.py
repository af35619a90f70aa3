"""Loss tests: analytic properties + full parity against the reference
implementation (imported read-only from /root/reference as a test oracle)."""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

from packnet_sfm_tpu.geometry.pose import pose_vec_to_mat
from packnet_sfm_tpu.losses import (
    MultiViewPhotometricConfig,
    SupervisedLossConfig,
    multiview_photometric_loss,
    progressive_num_scales,
    supervised_loss,
    velocity_loss,
)


def make_K(b, fx, fy, cx, cy):
    K = np.zeros((b, 3, 3), np.float32)
    K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = fx, fy, cx, cy, 1
    return K


def synthetic_batch(rng, b=1, h=32, w=48, n_ctx=2, n_scales=4):
    image = rng.uniform(size=(b, h, w, 3)).astype(np.float32)
    context = [rng.uniform(size=(b, h, w, 3)).astype(np.float32) for _ in range(n_ctx)]
    inv_depths = [
        (rng.uniform(size=(b, h >> i, w >> i, 1)) * 0.2 + 0.05).astype(np.float32)
        for i in range(n_scales)
    ]
    K = make_K(b, 40.0, 40.0, w / 2 - 0.5, h / 2 - 0.5)
    poses = [
        np.asarray(pose_vec_to_mat(jnp.asarray(
            rng.uniform(-0.05, 0.05, size=(b, 6)).astype(np.float32))))
        for _ in range(n_ctx)
    ]
    return image, context, inv_depths, K, poses


class TestPhotometric:
    def test_identity_warp_zero_loss(self):
        """Identity pose + context==image => photometric term ~0."""
        rng = np.random.default_rng(0)
        image, _, inv_depths, K, _ = synthetic_batch(rng)
        cfg = MultiViewPhotometricConfig(smooth_loss_weight=0.0, automask_loss=False,
                                         photometric_reduce_op="mean")
        eye = np.broadcast_to(np.eye(4, dtype=np.float32), (1, 4, 4))
        loss, metrics = multiview_photometric_loss(
            jnp.asarray(image), [jnp.asarray(image)],
            [jnp.asarray(d) for d in inv_depths],
            jnp.asarray(K), [jnp.asarray(eye)], cfg)
        assert float(loss) < 1e-5

    def test_automask_bounded_by_identity(self):
        """With automask(min), loss <= pure identity-reprojection loss."""
        rng = np.random.default_rng(1)
        image, context, inv_depths, K, poses = synthetic_batch(rng)
        cfg = MultiViewPhotometricConfig(smooth_loss_weight=0.0, automask_loss=True)
        loss_min, _ = multiview_photometric_loss(
            jnp.asarray(image), [jnp.asarray(c) for c in context],
            [jnp.asarray(d) for d in inv_depths],
            jnp.asarray(K), [jnp.asarray(p) for p in poses], cfg)
        cfg_mean = MultiViewPhotometricConfig(smooth_loss_weight=0.0, automask_loss=False,
                                              photometric_reduce_op="mean")
        loss_mean, _ = multiview_photometric_loss(
            jnp.asarray(image), [jnp.asarray(c) for c in context],
            [jnp.asarray(d) for d in inv_depths],
            jnp.asarray(K), [jnp.asarray(p) for p in poses], cfg_mean)
        assert float(loss_min) < float(loss_mean)

    def test_reference_parity(self):
        """Full-loss parity against the reference torch implementation."""
        torch = pytest.importorskip("torch")
        sys.path.insert(0, "/root/reference")
        try:
            from packnet_sfm.losses.multiview_photometric_loss import \
                MultiViewPhotometricLoss
            from packnet_sfm.geometry.pose import Pose
            from packnet_sfm.geometry.camera import Camera as _RefCamera
            # The reference hardcodes CUDA device moves (camera.py:37-41 via
            # warp_ref_image's ref_image.get_device()); neutralize for CPU.
            _RefCamera.to = lambda self, *a, **k: self
        except Exception as e:  # pragma: no cover
            pytest.skip(f"reference not importable: {e}")
        finally:
            sys.path.remove("/root/reference")

        rng = np.random.default_rng(2)
        image, context, inv_depths, K, poses = synthetic_batch(rng)

        ref_loss = MultiViewPhotometricLoss(
            num_scales=4, ssim_loss_weight=0.85, smooth_loss_weight=0.001,
            photometric_reduce_op="min", automask_loss=True, clip_loss=0.0)
        t = lambda x: torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
        with torch.no_grad():
            out = ref_loss(
                t(image), [t(c) for c in context],
                [t(d) for d in inv_depths],
                torch.from_numpy(K), torch.from_numpy(K),
                [Pose(torch.from_numpy(p)) for p in poses])
        theirs = float(out["loss"])

        cfg = MultiViewPhotometricConfig(
            num_scales=4, ssim_loss_weight=0.85, smooth_loss_weight=0.001,
            photometric_reduce_op="min", automask_loss=True, clip_loss=0.0)
        ours, _ = multiview_photometric_loss(
            jnp.asarray(image), [jnp.asarray(c) for c in context],
            [jnp.asarray(d) for d in inv_depths],
            jnp.asarray(K), [jnp.asarray(p) for p in poses], cfg)
        # fp32 accumulation-order noise between two different graphs is
        # ~1e-7 rel (measured); 1e-5 leaves margin while still catching
        # term-level mistakes (an earlier rtol of 1e-3 hid a factor-2
        # smoothness-weight bug — the term is ~5e-4 of the total).
        np.testing.assert_allclose(float(ours), theirs, rtol=1e-5)

    def test_gradients_finite(self):
        import jax
        rng = np.random.default_rng(3)
        image, context, inv_depths, K, poses = synthetic_batch(rng, h=16, w=16, n_scales=2)
        cfg = MultiViewPhotometricConfig(num_scales=2)

        def f(d0):
            loss, _ = multiview_photometric_loss(
                jnp.asarray(image), [jnp.asarray(c) for c in context],
                [d0, jnp.asarray(inv_depths[1])],
                jnp.asarray(K), [jnp.asarray(p) for p in poses], cfg)
            return loss

        g = jax.grad(f)(jnp.asarray(inv_depths[0]))
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).max()) > 0


class TestSupervised:
    def test_perfect_prediction(self):
        rng = np.random.default_rng(4)
        gt = (rng.uniform(size=(2, 16, 16, 1)) * 0.5 + 0.1).astype(np.float32)
        preds = [jnp.asarray(gt[:, ::1 << i, ::1 << i]) for i in range(4)]
        # nearest-resized gt at lower scales differs, so use 1 scale
        cfg = SupervisedLossConfig(supervised_method="sparse-l1", supervised_num_scales=1)
        loss, _ = supervised_loss(preds, jnp.asarray(gt), cfg)
        assert float(loss) < 1e-7

    def test_sparse_masks_invalid(self):
        gt = np.zeros((1, 8, 8, 1), np.float32)
        gt[0, 2, 2, 0] = 0.5
        pred = [jnp.full((1, 8, 8, 1), 0.5)]
        cfg = SupervisedLossConfig(supervised_method="sparse-l1", supervised_num_scales=1)
        loss, _ = supervised_loss(pred, jnp.asarray(gt), cfg)
        assert float(loss) < 1e-7  # only the valid pixel counts, and it matches

    @pytest.mark.parametrize("method", ["l1", "mse", "berhu", "silog", "abs_rel"])
    def test_methods_positive_finite(self, method):
        rng = np.random.default_rng(5)
        gt = (rng.uniform(size=(1, 8, 8, 1)) * 0.5 + 0.1).astype(np.float32)
        pred = [(jnp.asarray(gt) + 0.05)]
        cfg = SupervisedLossConfig(supervised_method=method, supervised_num_scales=1)
        loss, _ = supervised_loss(pred, jnp.asarray(gt), cfg)
        assert np.isfinite(float(loss)) and float(loss) > 0

    def test_berhu_matches_reference(self):
        torch = pytest.importorskip("torch")
        sys.path.insert(0, "/root/reference")
        try:
            from packnet_sfm.losses.supervised_loss import BerHuLoss
        finally:
            sys.path.remove("/root/reference")
        rng = np.random.default_rng(6)
        gt = (rng.uniform(size=(1, 8, 8, 1)) * 0.5 + 0.1).astype(np.float32)
        pred = (rng.uniform(size=(1, 8, 8, 1)) * 0.5 + 0.1).astype(np.float32)
        # The reference BerHu is only ever invoked on 1-D post-masking tensors
        # (supervised_loss.py:140-144 flattens via boolean indexing first).
        with torch.no_grad():
            theirs = float(BerHuLoss()(torch.from_numpy(pred.ravel()),
                                       torch.from_numpy(gt.ravel())))
        cfg = SupervisedLossConfig(supervised_method="berhu", supervised_num_scales=1)
        ours, _ = supervised_loss([jnp.asarray(pred)], jnp.asarray(gt), cfg)
        np.testing.assert_allclose(float(ours), theirs, rtol=1e-5)


class TestVelocity:
    def test_zero_when_equal(self):
        rng = np.random.default_rng(7)
        T = np.asarray(pose_vec_to_mat(jnp.asarray(
            rng.uniform(-0.5, 0.5, size=(2, 6)).astype(np.float32))))
        loss, _ = velocity_loss([jnp.asarray(T)], [jnp.asarray(T)])
        assert float(loss) < 1e-7

    def test_translation_magnitude(self):
        a = np.broadcast_to(np.eye(4, dtype=np.float32), (1, 4, 4)).copy()
        b = a.copy()
        a[:, 0, 3] = 3.0
        b[:, 1, 3] = 1.0
        loss, _ = velocity_loss([jnp.asarray(a)], [jnp.asarray(b)])
        np.testing.assert_allclose(float(loss), 2.0, atol=1e-6)


class TestProgressive:
    def test_disabled(self):
        assert progressive_num_scales(0.9, 4, 0.0) == 4

    def test_schedule_intended_semantics(self):
        """Note: the reference's ProgressiveScaling is accidentally a no-op
        (loss_base.py:44 ``is_list`` rejects the np.ndarray threshold table,
        so it always returns num_scales). We implement the *intended*
        searchsorted schedule; this is a respect-or-fix quirk (SURVEY §7.4).
        """
        import numpy as np_
        thresholds = np_.float32([0.1 * (i + 1) for i in range(3)] + [1.0])
        for p in [0.0, 0.05, 0.1, 0.15, 0.25, 0.31, 0.5, 1.0]:
            expected = int(4 - np_.searchsorted(thresholds, p))
            assert progressive_num_scales(p, 4, 0.1) == expected, p
