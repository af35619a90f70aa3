"""Direct photometric pose refinement (frame-to-frame matching).

The matching stage of the ego-motion pipeline (BASELINE north star; the
reference never refines poses). Given a target frame with predicted depth and
an initial relative pose (e.g. from PoseNet), Gauss-Newton refinement of the
6-DoF twist minimizing the dense photometric residual of the view-synthesis
warp — a direct method that reuses the framework's differentiable warp, so
the whole solver is jit-compiled with static iteration count (lax.scan).

J^T J is built from 6 JVPs of the residual (one per twist coordinate) —
no [HW, 6] jacobian materialization beyond one image-sized buffer per dim.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from packnet_sfm_tpu.geometry.camera import Camera, view_synthesis
from packnet_sfm_tpu.geometry.se3 import se3_exp
from packnet_sfm_tpu.losses.photometric import inv2depth


def _photometric_residual(xi, T0, target, ref, depth, K):
    """Per-pixel residual of warping ref into target with pose exp(xi)·T0."""
    T = se3_exp(xi[None])[0] @ T0
    cam = Camera(K=K)
    ref_cam = Camera(K=K, Tcw=T[None])
    warped = view_synthesis(ref, depth, ref_cam, cam, padding_mode="zeros")
    valid = (jnp.sum(jnp.abs(warped), axis=-1, keepdims=True) > 0).astype(
        target.dtype)
    return ((warped - target) * valid).reshape(-1), valid


@partial(jax.jit, static_argnames=("num_iterations", "levels"))
def refine_pose_photometric(
    target: jnp.ndarray,
    ref: jnp.ndarray,
    inv_depth: jnp.ndarray,
    K: jnp.ndarray,
    T_init: jnp.ndarray,
    num_iterations: int = 10,
    levels: int = 1,
    damping: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Refine target->ref transform by direct alignment.

    target/ref: [1, H, W, 3]; inv_depth: [1, H, W, 1]; K: [1, 3, 3];
    T_init: [4, 4]. Returns (T_refined [4,4], final mean |residual|).
    """
    depth = inv2depth(inv_depth)

    def gn_step(T, _):
        def r_of(xi):
            res, _ = _photometric_residual(xi, T, target, ref, depth, K)
            return res

        xi0 = jnp.zeros((6,), target.dtype)
        r0 = r_of(xi0)
        # Build J via 6 JVPs (forward-mode columns).
        eye = jnp.eye(6, dtype=target.dtype)
        cols = [jax.jvp(r_of, (xi0,), (eye[i],))[1] for i in range(6)]
        J = jnp.stack(cols, axis=-1)                       # [N, 6]
        H = J.T @ J + damping * jnp.eye(6, dtype=target.dtype)
        g = J.T @ r0
        dxi = -jnp.linalg.solve(H, g)
        # Halving line-search (3 trials) to keep GN robust.
        def cost(xi):
            r = r_of(xi)
            return jnp.sum(r * r)
        c0 = cost(xi0)
        best_T, best_c = T, c0
        for scale in (1.0, 0.5, 0.25):
            T_try = se3_exp((scale * dxi)[None])[0] @ T
            c_try = cost(scale * dxi)
            take = c_try < best_c
            best_T = jnp.where(take, T_try, best_T)
            best_c = jnp.where(take, c_try, best_c)
        return best_T, best_c

    T, costs = jax.lax.scan(gn_step, T_init, None, length=num_iterations)
    res, valid = _photometric_residual(
        jnp.zeros((6,), target.dtype), T, target, ref, depth, K)
    mean_abs = jnp.sum(jnp.abs(res)) / jnp.clip(jnp.sum(valid) * 3, min=1.0)
    return T, mean_abs
