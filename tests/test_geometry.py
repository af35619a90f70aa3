"""Geometry unit tests: golden values + round-trips + torch parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from packnet_sfm_tpu.geometry import (
    Camera,
    compose_poses,
    euler_to_rotation,
    invert_intrinsics,
    invert_pose,
    pose_vec_to_mat,
    project,
    reconstruct,
    scale_intrinsics,
    transform_points,
)


def rand_pose(rng, b=2):
    vec = rng.uniform(-0.3, 0.3, size=(b, 6)).astype(np.float32)
    return pose_vec_to_mat(jnp.asarray(vec)), vec


def make_K(b=2, fx=100.0, fy=110.0, cx=31.5, cy=23.5):
    K = np.zeros((b, 3, 3), np.float32)
    K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = fx, fy, cx, cy, 1
    return jnp.asarray(K)


class TestPose:
    def test_euler_identity(self):
        R = euler_to_rotation(jnp.zeros((3, 3)))
        np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (3, 3, 3)), atol=1e-6)

    def test_euler_orthonormal(self):
        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.uniform(-np.pi, np.pi, size=(4, 3)).astype(np.float32))
        R = euler_to_rotation(a)
        RtR = jnp.einsum("bij,bik->bjk", R, R)
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_euler_matches_torch_reference_convention(self):
        """R = Rx @ Ry @ Rz, matching reference pose_utils.py:8."""
        a = np.array([[0.1, -0.2, 0.3]], np.float32)
        x, y, z = a[0]

        def rx(t):
            return np.array([[1, 0, 0], [0, np.cos(t), -np.sin(t)], [0, np.sin(t), np.cos(t)]])

        def ry(t):
            return np.array([[np.cos(t), 0, np.sin(t)], [0, 1, 0], [-np.sin(t), 0, np.cos(t)]])

        def rz(t):
            return np.array([[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0], [0, 0, 1]])

        expected = rx(x) @ ry(y) @ rz(z)
        got = euler_to_rotation(jnp.asarray(a))[0]
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_invert_roundtrip(self):
        rng = np.random.default_rng(1)
        T, _ = rand_pose(rng)
        I = compose_poses(T, invert_pose(T))
        np.testing.assert_allclose(I, np.broadcast_to(np.eye(4), I.shape), atol=1e-6)

    def test_transform_points_identity(self):
        pts = jnp.asarray(np.random.default_rng(2).normal(size=(2, 4, 5, 3)).astype(np.float32))
        T = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
        np.testing.assert_allclose(transform_points(T, pts), pts, atol=1e-6)

    def test_transform_points_translation(self):
        pts = jnp.zeros((1, 2, 2, 3))
        T = jnp.eye(4)[None].at[0, :3, 3].set(jnp.array([1.0, 2.0, 3.0]))
        out = transform_points(T, pts)
        np.testing.assert_allclose(out[0, 0, 0], [1, 2, 3], atol=1e-6)


class TestCamera:
    def test_K_inverse(self):
        K = make_K()
        np.testing.assert_allclose(invert_intrinsics(K) @ K,
                                   np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)

    def test_scale_intrinsics_center_convention(self):
        """+0.5 pixel-center convention: cx' = (cx+0.5)*s - 0.5 (camera_utils.py:16)."""
        K = make_K(b=1, cx=31.5, cy=23.5)
        K2 = scale_intrinsics(K, 0.5)
        assert np.isclose(K2[0, 0, 0], 50.0)
        assert np.isclose(K2[0, 0, 2], (31.5 + 0.5) * 0.5 - 0.5)

    def test_reconstruct_project_roundtrip(self):
        K = make_K(b=2)
        cam = Camera(K=K)
        depth = jnp.full((2, 48, 64, 1), 5.0)
        pts = reconstruct(cam, depth)
        coords = project(cam, pts)
        # Round-trip must return the identity warp grid.
        u = np.linspace(-1, 1, 64)
        v = np.linspace(-1, 1, 48)
        np.testing.assert_allclose(coords[0, 0, :, 0], u, atol=1e-5)
        np.testing.assert_allclose(coords[0, :, 0, 1], v, atol=1e-5)

    def test_reconstruct_depth_scaling(self):
        cam = Camera(K=make_K(b=1))
        d1 = reconstruct(cam, jnp.full((1, 8, 8, 1), 1.0))
        d2 = reconstruct(cam, jnp.full((1, 8, 8, 1), 2.0))
        np.testing.assert_allclose(2 * np.asarray(d1), d2, atol=1e-6)

    def test_project_with_pose_matches_manual(self):
        rng = np.random.default_rng(3)
        T, _ = rand_pose(rng, b=1)
        K = make_K(b=1)
        cam = Camera(K=K, Tcw=T)
        pts = jnp.asarray(rng.normal(size=(1, 4, 6, 3)).astype(np.float32)) + jnp.array([0, 0, 10.0])
        coords = project(cam, pts)
        # manual: normalized pinhole projection of T @ pts
        p = np.asarray(pts).reshape(-1, 3) @ np.asarray(T)[0, :3, :3].T + np.asarray(T)[0, :3, 3]
        u = 100.0 * p[:, 0] / p[:, 2] + 31.5
        v = 110.0 * p[:, 1] / p[:, 2] + 23.5
        un = 2 * u / (6 - 1) - 1
        vn = 2 * v / (4 - 1) - 1
        np.testing.assert_allclose(np.asarray(coords).reshape(-1, 2)[:, 0], un, atol=1e-4)
        np.testing.assert_allclose(np.asarray(coords).reshape(-1, 2)[:, 1], vn, atol=1e-4)


class TestTorchParity:
    """Bit-level parity of the view-synthesis chain vs the torch formulation."""

    def test_grid_sample_parity(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        from packnet_sfm_tpu.ops.warp import grid_sample

        rng = np.random.default_rng(7)
        img = rng.normal(size=(2, 12, 16, 3)).astype(np.float32)
        coords = rng.uniform(-1.3, 1.3, size=(2, 10, 14, 2)).astype(np.float32)

        ours = grid_sample(jnp.asarray(img), jnp.asarray(coords), padding_mode="zeros")
        theirs = F.grid_sample(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(coords),
            mode="bilinear", padding_mode="zeros", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_grid_sample_border_parity(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        from packnet_sfm_tpu.ops.warp import grid_sample

        rng = np.random.default_rng(8)
        img = rng.normal(size=(1, 9, 11, 2)).astype(np.float32)
        coords = rng.uniform(-1.5, 1.5, size=(1, 7, 5, 2)).astype(np.float32)
        ours = grid_sample(jnp.asarray(img), jnp.asarray(coords), padding_mode="border")
        theirs = F.grid_sample(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            torch.from_numpy(coords),
            mode="bilinear", padding_mode="border", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_grid_sample_bf16_bitcast_path_exact(self):
        """The bf16 'zeros' path packs the 12-lane tap stack into f32 lanes
        around the gather (ops/warp.py); with bf16-exact pixel values and
        half-integer sample positions every lerp is exactly representable,
        so the bf16 path must equal the f32 path BITWISE — this pins the
        bitcast pack/unpack channel ordering."""
        from packnet_sfm_tpu.ops.warp import grid_sample

        rng = np.random.default_rng(3)
        h, w = 10, 14
        # pixel values k/16, exact in bf16; lerps at weights {0, 0.5} stay exact
        img = (rng.integers(0, 16, size=(2, h, w, 3)) / 16.0).astype(np.float32)
        xs = rng.integers(-2, 2 * w + 2, size=(2, 6, 9)) / 2.0   # half-integers
        ys = rng.integers(-2, 2 * h + 2, size=(2, 6, 9)) / 2.0
        coords = np.stack([2 * xs / (w - 1) - 1, 2 * ys / (h - 1) - 1],
                          axis=-1).astype(np.float32)
        ref = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(coords)))
        out = np.asarray(grid_sample(jnp.asarray(img, jnp.bfloat16),
                                     jnp.asarray(coords)).astype(jnp.float32))
        np.testing.assert_array_equal(out, ref)

    def test_grid_sample_data_matches_autodiff(self):
        """grid_sample_data (image-as-DATA custom_vjp): forward bitwise-equal
        to grid_sample, coordinate gradients equal to autodiff-through-gather
        (f32; the custom bwd differences taps in f32 to match autodiff's
        promoted precision). Measured negative result on speed is recorded in
        ops/warp.py and docs/bench_warp_probe.py."""
        import jax
        from packnet_sfm_tpu.ops.warp import grid_sample, grid_sample_data

        rng = np.random.default_rng(9)
        img = rng.normal(size=(2, 12, 16, 3)).astype(np.float32)
        coords = rng.uniform(-1.3, 1.3, size=(2, 10, 14, 2)).astype(np.float32)
        a = grid_sample(jnp.asarray(img), jnp.asarray(coords))
        b = grid_sample_data(jnp.asarray(img), jnp.asarray(coords))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        g_auto = jax.grad(lambda c: jnp.sum(grid_sample(jnp.asarray(img), c)))(
            jnp.asarray(coords))
        g_cust = jax.grad(
            lambda c: jnp.sum(grid_sample_data(jnp.asarray(img), c)))(
            jnp.asarray(coords))
        np.testing.assert_allclose(np.asarray(g_cust), np.asarray(g_auto),
                                   atol=1e-5)
