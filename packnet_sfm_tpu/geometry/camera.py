"""Differentiable pinhole camera, functional, NHWC.

Capability parity with reference geometry/camera.py and camera_utils.py,
re-designed as a pytree NamedTuple + pure functions so cameras flow through
jit/vmap/shard_map. Intrinsics are applied per-scalar (fx, fy, cx, cy) rather
than via 3x3 matmuls — elementwise VPU work fused by XLA instead of tiny
MXU-padded matmuls.

Conventions (identical to reference):
- ``Tcw`` is the world->camera transform; ``reconstruct`` lifts to world via
  ``Twc = inv(Tcw)`` (camera.py:66-69,112-148).
- ``project`` returns pixel coords normalized to [-1, 1] with
  align_corners=True semantics and z clamped at 1e-5 (camera.py:150-191).
- ``scale_intrinsics`` uses the +0.5 pixel-center convention
  (camera_utils.py:16-22).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from packnet_sfm_tpu.geometry.pose import invert_pose, transform_points
from packnet_sfm_tpu.ops.image import image_grid
from packnet_sfm_tpu.ops.warp import grid_sample


class Camera(NamedTuple):
    """Pinhole camera: intrinsics ``K`` [B, 3, 3] + optional world->cam ``Tcw`` [B, 4, 4]."""

    K: jnp.ndarray
    Tcw: Optional[jnp.ndarray] = None


def scale_intrinsics(K: jnp.ndarray, x_scale: float, y_scale: float | None = None) -> jnp.ndarray:
    """Rescale intrinsics for a resized image (reference camera_utils.py:16)."""
    if y_scale is None:
        y_scale = x_scale
    fx = K[..., 0, 0] * x_scale
    fy = K[..., 1, 1] * y_scale
    cx = (K[..., 0, 2] + 0.5) * x_scale - 0.5
    cy = (K[..., 1, 2] + 0.5) * y_scale - 0.5
    out = jnp.zeros_like(K)
    out = out.at[..., 0, 0].set(fx)
    out = out.at[..., 1, 1].set(fy)
    out = out.at[..., 0, 2].set(cx)
    out = out.at[..., 1, 2].set(cy)
    out = out.at[..., 2, 2].set(1.0)
    return out


def invert_intrinsics(K: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a pinhole K (reference camera.py:71-80)."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    out = jnp.zeros_like(K)
    out = out.at[..., 0, 0].set(1.0 / fx)
    out = out.at[..., 1, 1].set(1.0 / fy)
    out = out.at[..., 0, 2].set(-cx / fx)
    out = out.at[..., 1, 2].set(-cy / fy)
    out = out.at[..., 2, 2].set(1.0)
    return out


def reconstruct(cam: Camera, depth: jnp.ndarray) -> jnp.ndarray:
    """Lift a depth map [B, H, W, 1] to world-frame points [B, H, W, 3].

    Parity: reference camera.py:112 (``Camera.reconstruct`` with frame='w').
    """
    b, h, w, _ = depth.shape
    grid = image_grid(h, w, dtype=depth.dtype)  # [H, W, 3] = (u, v, 1)
    fx = cam.K[:, 0, 0][:, None, None]
    fy = cam.K[:, 1, 1][:, None, None]
    cx = cam.K[:, 0, 2][:, None, None]
    cy = cam.K[:, 1, 2][:, None, None]
    u = grid[None, ..., 0]
    v = grid[None, ..., 1]
    d = depth[..., 0]
    x = (u - cx) / fx * d
    y = (v - cy) / fy * d
    pts_c = jnp.stack([x, y, d], axis=-1)  # camera-frame points
    if cam.Tcw is None:
        return pts_c
    return transform_points(invert_pose(cam.Tcw), pts_c)


def project(cam: Camera, points: jnp.ndarray) -> jnp.ndarray:
    """Project world points [B, H, W, 3] to normalized pixel coords [B, H, W, 2].

    Output is in [-1, 1] with align_corners=True convention; z clamped at 1e-5.
    Parity: reference camera.py:150 (``Camera.project`` with frame='w').
    """
    b, h, w, _ = points.shape
    if cam.Tcw is not None:
        points = transform_points(cam.Tcw, points)
    fx = cam.K[:, 0, 0][:, None, None]
    fy = cam.K[:, 1, 1][:, None, None]
    cx = cam.K[:, 0, 2][:, None, None]
    cy = cam.K[:, 1, 2][:, None, None]
    X, Y, Z = points[..., 0], points[..., 1], points[..., 2]
    Z = jnp.clip(Z, min=1e-5)
    u = fx * X / Z + cx
    v = fy * Y / Z + cy
    un = 2.0 * u / (w - 1) - 1.0
    vn = 2.0 * v / (h - 1) - 1.0
    return jnp.stack([un, vn], axis=-1)


def view_synthesis(
    ref_image: jnp.ndarray,
    depth: jnp.ndarray,
    ref_cam: Camera,
    cam: Camera,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Warp ``ref_image`` into the frame of ``cam`` given its ``depth``.

    Parity: reference camera_utils.py:27 (``view_synthesis``):
    reconstruct -> project -> bilinear grid sample.
    """
    world_points = reconstruct(cam, depth)
    ref_coords = project(ref_cam, world_points)
    return grid_sample(ref_image, ref_coords, padding_mode=padding_mode)
