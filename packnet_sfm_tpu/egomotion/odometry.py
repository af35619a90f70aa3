"""End-to-end ego-motion pipeline: PoseNet odometry -> windowed refinement.

Ties the stages together (BASELINE north star):
1. PoseNet (or PoseResNet) predicts frame-to-frame transforms over a
   sequence (batched over pairs — one jit call per chunk).
2. Optional direct photometric alignment refines each relative pose against
   the predicted depth (egomotion/alignment.py).
3. Overlapping keyframe windows are refined by the Schur-complement pose
   graph (egomotion/posegraph.py) — windows can be sharded across the mesh —
   and spliced back into a full trajectory.
4. ATE/RPE evaluation against KITTI odometry ground truth
   (egomotion/evaluation.py).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from packnet_sfm_tpu.egomotion.alignment import refine_pose_photometric
from packnet_sfm_tpu.egomotion.posegraph import (
    PoseGraphConfig,
    chain_relative_poses,
    optimize_pose_graph,
)
from packnet_sfm_tpu.geometry.pose import invert_pose
from packnet_sfm_tpu.models.sfm import model_forward


def predict_relative_poses(model, variables, frames: np.ndarray,
                           batch_pairs: int = 8) -> np.ndarray:
    """Predict Z_{k,k+1} for consecutive frames [N, H, W, 3] -> [N-1, 4, 4].

    Uses the model's pose net with (frame_k as target, frame_{k+1} as
    context); the predicted pose is target->context.
    """
    n = frames.shape[0]

    # variables is a jit ARGUMENT (closed-over params would be baked into
    # the HLO as constants — rejected by the tunneled remote-compile
    # service for large nets, and re-compiled per checkpoint).
    @jax.jit
    def pair_poses(variables, targets, refs):
        out, _ = model_forward(
            model, variables,
            {"rgb": targets, "rgb_context": [refs, refs]}, train=False)
        return out["poses"][0]

    rels = []
    for s in range(0, n - 1, batch_pairs):
        e = min(s + batch_pairs, n - 1)
        t = jnp.asarray(frames[s:e])
        r = jnp.asarray(frames[s + 1:e + 1])
        pad = batch_pairs - (e - s)
        if pad:
            t = jnp.concatenate([t, jnp.repeat(t[-1:], pad, 0)])
            r = jnp.concatenate([r, jnp.repeat(r[-1:], pad, 0)])
        Z = np.asarray(pair_poses(variables, t, r))
        rels.append(Z[:e - s])
    return np.concatenate(rels, axis=0)


def predict_skip_poses(model, variables, frames: np.ndarray,
                       stride: int = 2, batch_pairs: int = 8) -> List[tuple]:
    """Independent pose measurements for (k, k+stride) frame pairs.

    These are *new measurements* (the pose net sees the actual frame pair),
    not compositions of the consecutive predictions — so the windowed pose
    graph gets genuinely independent constraints and can average down the
    random-walk drift of chained odometry. Returns [(i, j, Z, w), ...]
    suitable for ``refine_trajectory_windowed(extra_edges=...)``.
    """
    n = frames.shape[0]
    if n <= stride:
        return []

    @jax.jit
    def pair_poses(variables, targets, refs):
        out, _ = model_forward(
            model, variables,
            {"rgb": targets, "rgb_context": [refs, refs]}, train=False)
        return out["poses"][0]

    edges = []
    ks = list(range(0, n - stride))
    for s in range(0, len(ks), batch_pairs):
        chunk = ks[s:s + batch_pairs]
        t = jnp.asarray(frames[[k for k in chunk]])
        r = jnp.asarray(frames[[k + stride for k in chunk]])
        pad = batch_pairs - len(chunk)
        if pad:
            t = jnp.concatenate([t, jnp.repeat(t[-1:], pad, 0)])
            r = jnp.concatenate([r, jnp.repeat(r[-1:], pad, 0)])
        Z = np.asarray(pair_poses(variables, t, r))
        for ci, k in enumerate(chunk):
            edges.append((k, k + stride, Z[ci], 0.7))
    return edges


def refine_relative_poses(model, variables, frames, intrinsics,
                          relative: np.ndarray,
                          num_iterations: int = 8) -> np.ndarray:
    """Direct-alignment refinement of each relative pose using predicted
    depth of the target frame."""
    n = frames.shape[0]
    out = []
    for k in range(n - 1):
        fwd, _ = model_forward(
            model, variables, {"rgb": jnp.asarray(frames[k:k + 1])},
            train=False)
        inv_depth = fwd["inv_depths"][0]
        T, _ = refine_pose_photometric(
            jnp.asarray(frames[k:k + 1]), jnp.asarray(frames[k + 1:k + 2]),
            inv_depth, jnp.asarray(intrinsics[None]),
            jnp.asarray(relative[k]), num_iterations=num_iterations)
        out.append(np.asarray(T))
    return np.stack(out)


def trajectory_from_relative(relative: np.ndarray) -> np.ndarray:
    """Chain [N-1, 4, 4] relative poses into a [N, 4, 4] trajectory."""
    return np.asarray(chain_relative_poses(jnp.asarray(relative)))


def refine_trajectory_windowed(
    trajectory: np.ndarray,
    relative: np.ndarray,
    window: int = 10,
    overlap: int = 4,
    extra_edges: Optional[List[tuple]] = None,
    cfg: PoseGraphConfig = PoseGraphConfig(optimize_scales=False),
) -> np.ndarray:
    """Refine a long trajectory with overlapping pose-graph windows.

    Each window [s, s+window) is optimized against its odometry + skip edges
    (plus any ``extra_edges`` (i, j, Z, w) that fall inside), then spliced:
    the refined segment is rigidly re-anchored at the previous window's
    overlap frame. This is the host-side orchestration of the sharded-window
    scaling axis (SURVEY §5.7 counterpart).
    """
    n = trajectory.shape[0]
    out = trajectory.copy()
    extra_edges = extra_edges or []
    s = 0
    while s < n - 1:
        e = min(s + window, n)
        idx = np.arange(s, e)
        ii, jj, Zs, ws = [], [], [], []
        for k in range(s, e - 1):
            ii.append(k - s); jj.append(k - s + 1); Zs.append(relative[k]); ws.append(1.0)
        if not extra_edges:
            # Composed skip-2 edges are only a smoothness prior (no new
            # information); use them solely when no independent measurements
            # (predict_skip_poses / loop closures) are available.
            for k in range(s, e - 2):
                Z2 = relative[k] @ relative[k + 1]
                ii.append(k - s); jj.append(k - s + 2); Zs.append(Z2); ws.append(0.5)
        for (i, j, Z, w) in extra_edges:
            if s <= i < e and s <= j < e:
                ii.append(i - s); jj.append(j - s); Zs.append(Z); ws.append(w)
        edges = {
            "i": jnp.asarray(ii, jnp.int32),
            "j": jnp.asarray(jj, jnp.int32),
            "Z": jnp.asarray(np.stack(Zs).astype(np.float32)),
            "w": jnp.asarray(ws, jnp.float32),
        }
        T_win, _, _ = optimize_pose_graph(
            jnp.asarray(out[idx].astype(np.float32)), edges, cfg)
        T_win = np.asarray(T_win)
        # splice: re-anchor at window start
        anchor = out[s] @ np.linalg.inv(T_win[0])
        out[idx] = np.einsum("ij,njk->nik", anchor, T_win)
        if e == n:
            break
        s = e - overlap
    return out
