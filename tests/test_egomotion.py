"""Ego-motion tests: SE(3) maps, direct alignment, pose-graph BA (single and
sharded), trajectory metrics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from packnet_sfm_tpu.geometry.se3 import se3_exp, se3_log, so3_exp, so3_log
from packnet_sfm_tpu.egomotion.posegraph import (
    PoseGraphConfig,
    chain_relative_poses,
    optimize_pose_graph,
    optimize_pose_graph_sharded,
)
from packnet_sfm_tpu.egomotion.evaluation import (
    absolute_trajectory_error,
    align_umeyama,
    relative_pose_error,
)


class TestSE3:
    def test_exp_log_roundtrip(self):
        rng = np.random.default_rng(0)
        xi = rng.uniform(-0.8, 0.8, size=(16, 6)).astype(np.float32)
        T = se3_exp(jnp.asarray(xi))
        back = se3_log(T)
        np.testing.assert_allclose(np.asarray(back), xi, atol=1e-4)

    def test_exp_small_angle(self):
        xi = jnp.asarray([[1e-7, 2e-7, 0, 0, 0, 1e-8]], jnp.float32)
        T = se3_exp(xi)
        assert np.isfinite(np.asarray(T)).all()
        np.testing.assert_allclose(np.asarray(T[0, :3, 3]),
                                   [1e-7, 2e-7, 0], atol=1e-9)

    def test_so3_orthonormal(self):
        rng = np.random.default_rng(1)
        w = rng.uniform(-2, 2, size=(8, 3)).astype(np.float32)
        R = so3_exp(jnp.asarray(w))
        RtR = np.einsum("bij,bik->bjk", np.asarray(R), np.asarray(R))
        np.testing.assert_allclose(RtR, np.broadcast_to(np.eye(3), (8, 3, 3)),
                                   atol=1e-5)

    def test_grad_through_exp(self):
        g = jax.grad(lambda xi: jnp.sum(se3_exp(xi)))(jnp.zeros((1, 6)))
        assert np.isfinite(np.asarray(g)).all()


def make_trajectory(rng, n, step=1.0):
    """Smooth forward trajectory with slight turning."""
    poses = [np.eye(4, dtype=np.float32)]
    for k in range(n - 1):
        xi = np.array([0.02 * rng.normal(), 0.02 * rng.normal(), step,
                       0.002 * rng.normal(), 0.03 + 0.005 * rng.normal(),
                       0.002 * rng.normal()], np.float32)
        Z = np.asarray(se3_exp(jnp.asarray(xi[None])))[0]
        poses.append(poses[-1] @ Z)
    return np.stack(poses)


def make_edges(gt, rng, noise=0.02, loop=True):
    n = len(gt)
    ii, jj, Z, w = [], [], [], []

    def rel(i, j, sigma):
        true = np.linalg.inv(gt[i]) @ gt[j]
        xi = sigma * rng.normal(size=6).astype(np.float32)
        return true @ np.asarray(se3_exp(jnp.asarray(xi[None])))[0]

    for k in range(n - 1):
        ii.append(k); jj.append(k + 1); Z.append(rel(k, k + 1, noise)); w.append(1.0)
    for k in range(n - 2):  # skip-2 edges
        ii.append(k); jj.append(k + 2); Z.append(rel(k, k + 2, noise)); w.append(1.0)
    if loop:  # accurate long-range constraints (loop-closure analogue)
        for k in list(range(3, n, 3)) + [n - 1]:
            ii.append(0); jj.append(k); Z.append(rel(0, k, 1e-4)); w.append(3.0)
    return {
        "i": jnp.asarray(ii, jnp.int32),
        "j": jnp.asarray(jj, jnp.int32),
        "Z": jnp.asarray(np.stack(Z)),
        "w": jnp.asarray(w, jnp.float32),
    }


class TestPoseGraph:
    def test_zero_noise_stays_optimal(self):
        rng = np.random.default_rng(2)
        gt = make_trajectory(rng, 8)
        edges = make_edges(gt, rng, noise=0.0, loop=False)
        cfg = PoseGraphConfig(num_iterations=5, optimize_scales=False)
        T_opt, scales, cost = optimize_pose_graph(jnp.asarray(gt), edges, cfg)
        assert float(cost) < 1e-6
        np.testing.assert_allclose(np.asarray(T_opt), gt, atol=1e-4)

    def test_refinement_reduces_ate(self):
        rng = np.random.default_rng(3)
        n = 10
        gt = make_trajectory(rng, n)
        edges = make_edges(gt, rng, noise=0.03, loop=True)
        # Initialize by chaining only the noisy odometry edges.
        T_init = np.asarray(chain_relative_poses(edges["Z"][:n - 1]))
        ate_init = absolute_trajectory_error(T_init, gt, align_scale=False)
        cfg = PoseGraphConfig(num_iterations=15, optimize_scales=False)
        T_opt, _, cost = optimize_pose_graph(jnp.asarray(T_init), edges, cfg)
        ate_opt = absolute_trajectory_error(np.asarray(T_opt), gt,
                                            align_scale=False)
        assert np.isfinite(float(cost))
        assert ate_opt < ate_init * 0.8, (ate_init, ate_opt)

    def test_scale_recovery(self):
        """Odometry edges with a uniform scale error: Schur-eliminated scale
        variables should absorb it when a metric loop edge is present."""
        rng = np.random.default_rng(4)
        n = 8
        gt = make_trajectory(rng, n)
        edges = make_edges(gt, rng, noise=0.0, loop=True)
        # shrink odometry/skip translations by 0.8 (monocular scale drift);
        # loop-closure edges (appended last) stay metric
        n_drift = (n - 1) + (n - 2)
        Z = np.array(edges["Z"])
        Z[:n_drift, :3, 3] *= 0.8
        edges["Z"] = jnp.asarray(Z)
        T_init = np.asarray(chain_relative_poses(edges["Z"][:n - 1]))
        cfg = PoseGraphConfig(num_iterations=20, optimize_scales=True)
        T_opt, scales, _ = optimize_pose_graph(jnp.asarray(T_init), edges, cfg)
        ate_opt = absolute_trajectory_error(np.asarray(T_opt), gt,
                                            align_scale=False)
        ate_init = absolute_trajectory_error(T_init, gt, align_scale=False)
        assert ate_opt < ate_init * 0.5, (ate_init, ate_opt)
        # recovered scales should move toward log(1/0.8)
        assert np.mean(np.asarray(scales)[1:]) > 0.05

    def test_sharded_matches_single(self):
        from packnet_sfm_tpu.parallel.mesh import make_mesh
        rng = np.random.default_rng(5)
        gt = make_trajectory(rng, 8)
        edges = make_edges(gt, rng, noise=0.02, loop=True)
        T_init = np.asarray(chain_relative_poses(edges["Z"][:7]))
        cfg = PoseGraphConfig(num_iterations=10, optimize_scales=True)
        T_a, s_a, c_a = optimize_pose_graph(jnp.asarray(T_init), edges, cfg)
        mesh = make_mesh()
        T_b, s_b, c_b = optimize_pose_graph_sharded(
            jnp.asarray(T_init), edges, mesh, cfg)
        np.testing.assert_allclose(np.asarray(T_a), np.asarray(T_b), atol=1e-4)
        np.testing.assert_allclose(float(c_a), float(c_b), rtol=1e-4)


class TestAlignment:
    def test_recovers_known_pose(self):
        """Direct alignment recovers a small known transform.

        Scene: plane at Z=5 in the target frame with a continuous analytic
        texture. The target->ref correspondence is then the exact homography
        H = K (R + t n^T / d) K^{-1}, so both views can be rendered without
        interpolation bias.
        """
        from packnet_sfm_tpu.egomotion.alignment import refine_pose_photometric

        h, w = 48, 64
        fx = 40.0
        K = np.array([[fx, 0, w / 2 - 0.5], [0, fx, h / 2 - 0.5],
                      [0, 0, 1]], np.float64)

        def texture(u, v):
            return np.stack([
                0.5 + 0.4 * np.sin(u / 2.5) * np.cos(v / 3.5),
                0.5 + 0.4 * np.sin(u / 4.0 + 1.0) * np.sin(v / 2.0),
                0.5 + 0.4 * np.cos(u / 3.0 + v / 5.0)], -1)

        ys, xs = np.mgrid[:h, :w].astype(np.float64)
        target = texture(xs, ys).astype(np.float32)[None]
        depth = np.full((1, h, w, 1), 5.0, np.float32)

        xi_true = np.array([0.05, -0.03, 0.06, 0.003, -0.004, 0.002], np.float64)
        T_true = np.asarray(se3_exp(jnp.asarray(xi_true[None], jnp.float64))
                            if False else se3_exp(jnp.asarray(
                                xi_true[None].astype(np.float32))))[0].astype(np.float64)
        # target pixel p -> ref pixel q: q ~ K (R + t n^T / d) K^-1 p
        R, t = T_true[:3, :3], T_true[:3, 3]
        H = K @ (R + np.outer(t, [0, 0, 1]) / 5.0) @ np.linalg.inv(K)
        Hinv = np.linalg.inv(H)
        # ref(q) = texture at the target location that maps to q
        q = np.stack([xs, ys, np.ones_like(xs)], -1) @ Hinv.T
        qu, qv = q[..., 0] / q[..., 2], q[..., 1] / q[..., 2]
        ref = texture(qu, qv).astype(np.float32)[None]

        T_refined, residual = refine_pose_photometric(
            jnp.asarray(target), jnp.asarray(ref), jnp.asarray(1.0 / depth),
            jnp.asarray(K.astype(np.float32))[None], jnp.eye(4),
            num_iterations=20)
        xi_err = np.asarray(se3_log(
            (jnp.linalg.inv(T_refined) @ jnp.asarray(
                T_true.astype(np.float32)))[None]))[0]
        assert float(residual) < 0.03
        assert np.linalg.norm(xi_err[:3]) < 0.035, xi_err  # ~3x better than init (0.085)
        assert np.linalg.norm(xi_err[3:]) < 0.006, xi_err


class TestTrajectoryMetrics:
    def test_umeyama_exact(self):
        rng = np.random.default_rng(6)
        pts = rng.normal(size=(20, 3))
        Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        transformed = 2.0 * pts @ Q.T + np.array([1.0, 2.0, 3.0])
        aligned, scale = align_umeyama(pts, transformed)
        np.testing.assert_allclose(aligned, transformed, atol=1e-10)
        assert abs(scale - 2.0) < 1e-10

    def test_ate_zero_for_identical(self):
        rng = np.random.default_rng(7)
        gt = make_trajectory(rng, 10)  # float32 poses -> ~1e-6 noise floor
        assert absolute_trajectory_error(gt, gt) < 1e-4

    def test_rpe(self):
        rng = np.random.default_rng(8)
        gt = make_trajectory(rng, 10)
        t_err, r_err = relative_pose_error(gt, gt)
        assert t_err < 1e-5 and r_err < 1e-3


class TestOdometryPipeline:
    def test_windowed_refinement(self):
        from packnet_sfm_tpu.egomotion.odometry import (
            refine_trajectory_windowed, trajectory_from_relative)
        rng = np.random.default_rng(9)
        n = 24
        gt = make_trajectory(rng, n)
        rel_true = np.stack([np.linalg.inv(gt[k]) @ gt[k + 1]
                             for k in range(n - 1)])
        noise = np.stack([np.asarray(se3_exp(jnp.asarray(
            (0.02 * rng.normal(size=6)).astype(np.float32)[None])))[0]
            for _ in range(n - 1)])
        rel_noisy = np.einsum("nij,njk->nik", rel_true, noise)
        traj = trajectory_from_relative(rel_noisy)
        # accurate long-range edges every 6 frames
        extra = []
        for k in range(0, n - 6, 6):
            extra.append((k, k + 6, np.linalg.inv(gt[k]) @ gt[k + 6], 3.0))
        refined = refine_trajectory_windowed(
            traj, rel_noisy, window=12, overlap=4, extra_edges=extra)
        ate_before = absolute_trajectory_error(traj, gt, align_scale=False)
        ate_after = absolute_trajectory_error(refined, gt, align_scale=False)
        assert ate_after < ate_before, (ate_before, ate_after)
