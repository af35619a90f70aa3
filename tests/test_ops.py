"""Image op tests: packing round-trips + SSIM/pooling torch parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from packnet_sfm_tpu.ops import (
    depth_to_space,
    flip_lr,
    gradient_x,
    gradient_y,
    image_grid,
    interpolate_image,
    space_to_depth,
)
from packnet_sfm_tpu.ops.ssim import ssim, ssim_loss


class TestPacking:
    def test_roundtrip(self):
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 12, 5)).astype(np.float32))
        np.testing.assert_allclose(depth_to_space(space_to_depth(x, 2), 2), x)

    def test_channel_order_matches_torch_pixelshuffle(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 4 * 4, 3, 5)).astype(np.float32)  # NCHW, C=c*r*r
        theirs = torch.nn.PixelShuffle(2)(torch.from_numpy(x)).numpy()  # [2,4,6,10]
        ours = depth_to_space(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
        np.testing.assert_allclose(np.asarray(ours), theirs.transpose(0, 2, 3, 1))

    def test_space_to_depth_matches_reference_packing(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(2)
        x = rng.normal(size=(1, 3, 4, 6)).astype(np.float32)  # NCHW
        # reference layers01.py:126 packing semantics
        t = torch.from_numpy(x)
        b, c, h, w = t.shape
        r = 2
        ref = t.view(b, c, h // r, r, w // r, r).permute(0, 1, 3, 5, 2, 4).reshape(
            b, c * r * r, h // r, w // r).numpy()
        ours = space_to_depth(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
        np.testing.assert_allclose(np.asarray(ours), ref.transpose(0, 2, 3, 1))


class TestImageOps:
    def test_flip_lr(self):
        x = jnp.arange(6, dtype=jnp.float32).reshape(1, 1, 6, 1)
        np.testing.assert_allclose(flip_lr(x)[0, 0, :, 0], [5, 4, 3, 2, 1, 0])

    def test_gradients_shapes(self):
        x = jnp.zeros((2, 5, 7, 3))
        assert gradient_x(x).shape == (2, 5, 6, 3)
        assert gradient_y(x).shape == (2, 4, 7, 3)

    def test_image_grid(self):
        g = image_grid(3, 4)
        assert g.shape == (3, 4, 3)
        np.testing.assert_allclose(g[1, 2], [2, 1, 1])

    def test_interpolate_matches_torch_align_corners(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, 6, 8, 3)).astype(np.float32)
        ours = interpolate_image(jnp.asarray(x), (12, 16), mode="bilinear")
        theirs = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(12, 16),
                               mode="bilinear", align_corners=True).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs.transpose(0, 2, 3, 1), atol=1e-5)


class TestSSIM:
    def test_identical_images(self):
        x = jnp.asarray(np.random.default_rng(4).uniform(size=(1, 16, 16, 3)).astype(np.float32))
        np.testing.assert_allclose(ssim_loss(x, x), np.zeros((1, 16, 16, 3)), atol=1e-6)

    def test_matches_torch_reference_ssim(self):
        torch = pytest.importorskip("torch")
        import torch.nn as tnn
        rng = np.random.default_rng(5)
        x = rng.uniform(size=(2, 12, 14, 3)).astype(np.float32)
        y = rng.uniform(size=(2, 12, 14, 3)).astype(np.float32)

        # Reference SSIM (multiview_photometric_loss.py:14-53)
        def ref_ssim(a, b, C1=1e-4, C2=9e-4):
            pool = tnn.AvgPool2d(3, stride=1)
            refl = tnn.ReflectionPad2d(1)
            a, b = refl(a), refl(b)
            mu_x, mu_y = pool(a), pool(b)
            sigma_x = pool(a ** 2) - mu_x ** 2
            sigma_y = pool(b ** 2) - mu_y ** 2
            sigma_xy = pool(a * b) - mu_x * mu_y
            v1 = 2 * sigma_xy + C2
            v2 = sigma_x + sigma_y + C2
            return ((2 * mu_x * mu_y + C1) * v1) / ((mu_x ** 2 + mu_y ** 2 + C1) * v2)

        theirs = ref_ssim(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          torch.from_numpy(y.transpose(0, 3, 1, 2))).numpy()
        ours = ssim(jnp.asarray(x), jnp.asarray(y))
        np.testing.assert_allclose(np.asarray(ours), theirs.transpose(0, 2, 3, 1), atol=1e-5)
