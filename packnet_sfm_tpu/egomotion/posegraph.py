"""Windowed pose-graph bundle adjustment with Schur-complement reduction.

The distributed ego-motion refinement stage (BASELINE north star; no
reference counterpart — designed from scratch for TPU):

- A window of N keyframe poses T_i (world<-frame) plus a per-keyframe
  monocular log-scale s_i (drift correction) are optimized against E relative
  -pose edge measurements Z_ij (from PoseNet and/or direct alignment,
  egomotion/alignment.py).
- Edge residual: r_ij = log( Z_ij(s_i)^{-1} · T_i^{-1} · T_j ) in se(3),
  where Z_ij(s_i) scales the measured translation by exp(s_i).
- Gauss-Newton with a fixed iteration count (lax.scan): per-edge jacobians by
  autodiff, normal equations assembled as dense [7N, 7N] (N <= ~32 keyframes
  per window, so the solve is tiny), **scale block eliminated by Schur
  complement**: H_pp' = H_pp − H_ps H_ss^{-1} H_sp, solve poses, back-
  substitute scales. Gauge fixed by a strong prior on pose 0 and scale 0.
- Distribution: ``optimize_pose_graph_sharded`` shards the edge set across
  the mesh's ``data`` axis with shard_map; each device reduces its partial
  (H, b) and a single psum recovers the global normal equations — the
  Schur-complement-over-collectives pattern, with per-device work growing
  with E/devices.

All shapes static; edges are padded with zero-weight entries to a multiple of
the device count.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from packnet_sfm_tpu.geometry.pose import invert_pose
from packnet_sfm_tpu.geometry.se3 import se3_exp, se3_log


@dataclasses.dataclass(frozen=True)
class PoseGraphConfig:
    num_iterations: int = 12
    damping: float = 1e-6
    pose_prior: float = 1e6      # gauge fixing on pose 0
    scale_prior: float = 1e6     # gauge fixing on scale 0
    rot_weight: float = 100.0    # rotation residual weight vs translation
    optimize_scales: bool = True


def _edge_residual(poses_xi, scales, T_lin, i, j, Z, rot_weight):
    """Residual for one edge given twist perturbations around linearization.

    poses_xi: [N, 6] local updates; T_lin: [N, 4, 4] current pose estimates.
    """
    Ti = se3_exp(poses_xi[i][None])[0] @ T_lin[i]
    Tj = se3_exp(poses_xi[j][None])[0] @ T_lin[j]
    Zs = Z.at[:3, 3].multiply(jnp.exp(scales[i]))
    rel = invert_pose(Zs[None])[0] @ (invert_pose(Ti[None])[0] @ Tj)
    r = se3_log(rel[None])[0]
    return r * jnp.array([1.0, 1.0, 1.0, rot_weight, rot_weight, rot_weight],
                         poses_xi.dtype)


def _edge_system(T_lin, scales, edge):
    """Dense jacobian blocks and residual for one edge.

    edge: dict of i, j (int32), Z [4,4], weight (float).
    Returns (J_p [6, N*6], J_s [6, N], r [6]) — dense over the window, which
    keeps assembly a pure sum (N is small).
    """
    n = T_lin.shape[0]
    i, j, Z, w, rot_weight = edge

    def r_of(xi_flat, s):
        return _edge_residual(xi_flat.reshape(n, 6), s, T_lin, i, j, Z, rot_weight)

    xi0 = jnp.zeros((n * 6,), T_lin.dtype)
    r0 = r_of(xi0, scales)
    Jp = jax.jacfwd(r_of, argnums=0)(xi0, scales)        # [6, N*6]
    Js = jax.jacfwd(r_of, argnums=1)(xi0, scales)        # [6, N]
    return Jp * w, Js * w, r0 * w


def _build_normal_equations(T_lin, scales, edges, rot_weight):
    """Sum per-edge systems into (H_pp, H_ps, H_ss, b_p, b_s)."""
    n = T_lin.shape[0]

    def one(edge):
        i, j, Z, w = edge
        Jp, Js, r = _edge_system(T_lin, scales, (i, j, Z, w, rot_weight))
        return (Jp.T @ Jp, Jp.T @ Js, Js.T @ Js, Jp.T @ r, Js.T @ r)

    sys = jax.vmap(one)((edges["i"], edges["j"], edges["Z"], edges["w"]))
    return tuple(jnp.sum(s, axis=0) for s in sys)


def _solve_schur(H_pp, H_ps, H_ss, b_p, b_s, cfg: PoseGraphConfig, n):
    """Gauge priors + Schur elimination of the scale block."""
    dtype = H_pp.dtype
    # Gauge: pin pose 0 and scale 0.
    prior_p = jnp.zeros((n * 6,), dtype).at[:6].set(cfg.pose_prior)
    H_pp = H_pp + jnp.diag(prior_p) + cfg.damping * jnp.eye(n * 6, dtype=dtype)
    prior_s = jnp.zeros((n,), dtype).at[0].set(cfg.scale_prior)
    H_ss = H_ss + jnp.diag(prior_s) + cfg.damping * jnp.eye(n, dtype=dtype)

    if cfg.optimize_scales:
        H_ss_inv = jnp.linalg.inv(H_ss)
        H_red = H_pp - H_ps @ H_ss_inv @ H_ps.T
        b_red = b_p - H_ps @ (H_ss_inv @ b_s)
        dxi = -jnp.linalg.solve(H_red, b_red)
        ds = -H_ss_inv @ (b_s + H_ps.T @ dxi)
    else:
        dxi = -jnp.linalg.solve(H_pp, b_p)
        ds = jnp.zeros((n,), dtype)
    return dxi.reshape(n, 6), ds


@partial(jax.jit, static_argnames=("cfg",))
def optimize_pose_graph(
    T_init: jnp.ndarray,
    edges: dict,
    cfg: PoseGraphConfig = PoseGraphConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Optimize a window of poses against relative-pose edges.

    T_init: [N, 4, 4] initial world<-frame poses.
    edges: {'i': [E] int32, 'j': [E] int32, 'Z': [E, 4, 4], 'w': [E]} —
      measured T_i^{-1} T_j with scalar weights (0 = padding).
    Returns (T_opt [N, 4, 4], scales [N], final_cost).
    """
    n = T_init.shape[0]

    def gn(carry, _):
        T_lin, scales = carry
        H_pp, H_ps, H_ss, b_p, b_s = _build_normal_equations(
            T_lin, scales, edges, cfg.rot_weight)
        dxi, ds = _solve_schur(H_pp, H_ps, H_ss, b_p, b_s, cfg, n)
        T_new = jax.vmap(lambda d, T: se3_exp(d[None])[0] @ T)(dxi, T_lin)
        return (T_new, scales + ds), None

    (T_opt, scales), _ = jax.lax.scan(
        gn, (T_init, jnp.zeros((n,), T_init.dtype)), None,
        length=cfg.num_iterations)

    def edge_cost(i, j, Z, w):
        r = _edge_residual(jnp.zeros((n, 6), T_init.dtype), scales,
                           T_opt, i, j, Z, cfg.rot_weight)
        return w * jnp.sum(r * r)

    cost = jnp.sum(jax.vmap(edge_cost)(
        edges["i"], edges["j"], edges["Z"], edges["w"]))
    return T_opt, scales, cost


def optimize_pose_graph_sharded(
    T_init: jnp.ndarray,
    edges: dict,
    mesh: Mesh,
    cfg: PoseGraphConfig = PoseGraphConfig(),
):
    """Distributed variant: edges sharded over the mesh's ``data`` axis;
    per-device partial (H, b) reduced with a single psum per GN iteration.

    Edge count is padded to a multiple of the axis size with zero-weight
    entries (weights make padding exact, not approximate).
    """
    n = T_init.shape[0]
    n_dev = mesh.shape["data"]
    e = edges["i"].shape[0]
    pad = (-e) % n_dev
    if pad:
        edges = {
            "i": jnp.pad(edges["i"], (0, pad)),
            "j": jnp.pad(edges["j"], (0, pad), constant_values=1),
            "Z": jnp.pad(edges["Z"], ((0, pad), (0, 0), (0, 0)))
            .at[e:, jnp.arange(4), jnp.arange(4)].set(1.0),
            "w": jnp.pad(edges["w"], (0, pad)),
        }

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P(), P(), P()),
    )
    def run(T0, edge_shard):
        def gn(carry, _):
            T_lin, scales = carry
            partial_sys = _build_normal_equations(
                T_lin, scales, edge_shard, cfg.rot_weight)
            H_pp, H_ps, H_ss, b_p, b_s = (
                jax.lax.psum(s, "data") for s in partial_sys)
            dxi, ds = _solve_schur(H_pp, H_ps, H_ss, b_p, b_s, cfg, n)
            T_new = jax.vmap(lambda d, T: se3_exp(d[None])[0] @ T)(dxi, T_lin)
            return (T_new, scales + ds), None

        (T_opt, scales), _ = jax.lax.scan(
            gn, (T0, jnp.zeros((n,), T0.dtype)), None,
            length=cfg.num_iterations)

        def edge_cost(i, j, Z, w):
            r = _edge_residual(jnp.zeros((n, 6), T0.dtype), scales,
                               T_opt, i, j, Z, cfg.rot_weight)
            return w * jnp.sum(r * r)

        cost = jax.lax.psum(jnp.sum(jax.vmap(edge_cost)(
            edge_shard["i"], edge_shard["j"], edge_shard["Z"],
            edge_shard["w"])), "data")
        return T_opt, scales, cost

    return run(T_init, edges)


def chain_relative_poses(relative: jnp.ndarray) -> jnp.ndarray:
    """[M, 4, 4] relative transforms Z_{k,k+1} -> [M+1, 4, 4] trajectory."""
    def step(T, Z):
        T_next = T @ Z
        return T_next, T_next
    eye = jnp.eye(4, dtype=relative.dtype)
    _, traj = jax.lax.scan(step, eye, relative)
    return jnp.concatenate([eye[None], traj], axis=0)
