"""Neural Ray Surface (generic camera) tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from packnet_sfm_tpu.geometry.camera_generic import (
    GenericCamera,
    canonical_pinhole_rays,
    generic_project,
    generic_reconstruct,
    projection_temperature,
)
from packnet_sfm_tpu.losses.generic_photometric import (
    GenericPhotometricConfig,
    blend_ray_surface,
    generic_multiview_photometric_loss,
)


class TestGenericCamera:
    def test_reconstruct_scales_with_depth(self):
        rays = canonical_pinhole_rays(16, 24)[None]
        cam = GenericCamera(rays=rays)
        p1 = generic_reconstruct(cam, jnp.full((1, 16, 24, 1), 2.0))
        p2 = generic_reconstruct(cam, jnp.full((1, 16, 24, 1), 4.0))
        np.testing.assert_allclose(2 * np.asarray(p1), np.asarray(p2), atol=1e-6)

    def test_project_identity(self):
        """Projecting a camera's own back-projected points must return the
        identity warp grid (low temperature => hard argmax at self)."""
        h, w = 32, 48
        rays = canonical_pinhole_rays(h, w)[None]
        cam = GenericCamera(rays=rays)
        depth = jnp.full((1, h, w, 1), 5.0)
        pts = generic_reconstruct(cam, depth)
        coords = generic_project(cam, pts, temperature=1e-8, patch=4,
                                 downsample=False)
        grid_x = np.linspace(-1, 1, w)
        grid_y = np.linspace(-1, 1, h)
        # interior pixels (borders can snap to window edges)
        c = np.asarray(coords)
        np.testing.assert_allclose(c[0, 8, 4:-4, 0], grid_x[4:-4], atol=2e-2)
        np.testing.assert_allclose(c[0, 4:-4, 8, 1], grid_y[4:-4], atol=2e-2)

    def test_project_downsample_path(self):
        h, w = 32, 48
        rays = canonical_pinhole_rays(h, w)[None]
        cam = GenericCamera(rays=rays)
        pts = generic_reconstruct(cam, jnp.full((1, h, w, 1), 5.0))
        coords = generic_project(cam, pts, temperature=1e-6, patch=4,
                                 downsample=True)
        assert coords.shape == (1, h, w, 2)
        assert np.isfinite(np.asarray(coords)).all()

    def test_temperature_schedule(self):
        assert projection_temperature(0.0) == pytest.approx(1e-4)
        assert projection_temperature(1.0) == pytest.approx(1e-4 / np.exp(0.1))


class TestGenericLoss:
    def test_blend_normalized(self):
        canonical = canonical_pinhole_rays(8, 8)
        res = jnp.asarray(np.random.default_rng(0).normal(
            scale=0.1, size=(1, 8, 8, 3)).astype(np.float32))
        rays = blend_ray_surface(canonical, res, 0.5)
        norms = np.linalg.norm(np.asarray(rays), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    def test_loss_and_grads(self):
        rng = np.random.default_rng(1)
        b, h, w = 1, 16, 24
        img = rng.uniform(size=(b, h, w, 3)).astype(np.float32)
        ctx = [rng.uniform(size=(b, h, w, 3)).astype(np.float32)]
        inv_depth = (rng.uniform(size=(b, h, w, 1)) * 0.2 + 0.05).astype(np.float32)
        residual = rng.normal(scale=0.01, size=(b, h, w, 3)).astype(np.float32)
        T = np.eye(4, dtype=np.float32)[None].copy()
        T[0, 0, 3] = 0.1
        cfg = GenericPhotometricConfig(patch=3, smooth_loss_weight=0.001,
                                       automask_loss=True,
                                       photometric_reduce_op="min")
        canonical = canonical_pinhole_rays(h, w)

        def f(d, r):
            loss, _ = generic_multiview_photometric_loss(
                jnp.asarray(img), [jnp.asarray(c) for c in ctx], [d], r,
                canonical, [jnp.asarray(T)], cfg, progress=0.5,
                temperature=1e-4)
            return loss

        loss = f(jnp.asarray(inv_depth), jnp.asarray(residual))
        assert np.isfinite(float(loss))
        gd, gr = jax.grad(f, argnums=(0, 1))(
            jnp.asarray(inv_depth), jnp.asarray(residual))
        assert np.isfinite(np.asarray(gd)).all()
        assert np.isfinite(np.asarray(gr)).all()
        assert float(jnp.abs(gd).max()) > 0


class TestGenericModels:
    def test_raysurface_resnet_shapes(self):
        from packnet_sfm_tpu.nn.raysurface import RaySurfaceResNet
        net = RaySurfaceResNet(version="18")
        x = jnp.zeros((1, 32, 64, 3))
        vs = net.init(jax.random.PRNGKey(0), x, train=False)
        out = net.apply(vs, x, train=False)
        assert out["ray_surface"].shape == (1, 32, 64, 3)
        assert len(out["inv_depths"]) == 4

    def test_generic_selfsup_model_loss(self):
        from packnet_sfm_tpu.core.config import get_default_config
        from packnet_sfm_tpu.engine.factory import setup_model
        from packnet_sfm_tpu.models.sfm import init_model, model_loss

        cfg = get_default_config()
        cfg.model.name = "GenericSelfSupModel"
        cfg.model.depth_net.name = "RaySurfaceResNet"
        cfg.model.depth_net.version = "18"
        cfg.model.pose_net.name = "PoseNet"
        model = setup_model(cfg.model)
        assert model.flip_lr_prob == 0.0

        rng = np.random.default_rng(2)
        b, h, w = 1, 32, 64
        img = rng.uniform(size=(b, h, w, 3)).astype(np.float32)
        batch = {
            "rgb": img, "rgb_original": img.copy(),
            "rgb_context": [img.copy(), img.copy()],
            "rgb_context_original": [img.copy(), img.copy()],
            "intrinsics": np.broadcast_to(np.eye(3, dtype=np.float32), (b, 3, 3)).copy(),
        }
        variables = init_model(model, jax.random.PRNGKey(0), batch)
        loss, (metrics, out, _) = model_loss(
            model, variables, batch, jax.random.PRNGKey(1), progress=0.3)
        assert np.isfinite(float(loss))
        assert "ray_surface" in out
