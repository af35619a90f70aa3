"""Differentiable SE(3) utilities, pure JAX.

Capability parity with reference geometry/pose.py and geometry/pose_utils.py,
re-designed functionally: a pose is just a ``[..., 4, 4]`` jnp array pytree —
no wrapper class, so poses flow through jit/vmap/shard_map untouched.

Conventions (matching the reference, see pose_utils.py:8-62):
- ``euler_to_rotation``: R = Rx @ Ry @ Rz from (x, y, z) euler angles.
- ``pose_vec_to_mat``: [B, 6] = [tx, ty, tz, rx, ry, rz] -> [B, 4, 4].
"""

from __future__ import annotations

import jax.numpy as jnp


def euler_to_rotation(angles: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] euler angles (x, y, z) -> [..., 3, 3] rotation, R = Rx·Ry·Rz.

    Parity: reference geometry/pose_utils.py:8 (``euler2mat``).
    """
    x, y, z = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    # Row-wise assembly of Rx @ Ry @ Rz, fully fused elementwise (VPU-friendly;
    # no tiny batched 3x3 matmuls for XLA to pad onto the MXU).
    r00 = cy * cz
    r01 = -cy * sz
    r02 = sy
    r10 = cx * sz + sx * sy * cz
    r11 = cx * cz - sx * sy * sz
    r12 = -sx * cy
    r20 = sx * sz - cx * sy * cz
    r21 = sx * cz + cx * sy * sz
    r22 = cx * cy
    rows = jnp.stack([
        jnp.stack([r00, r01, r02], axis=-1),
        jnp.stack([r10, r11, r12], axis=-1),
        jnp.stack([r20, r21, r22], axis=-1),
    ], axis=-2)
    return rows


def pose_vec_to_mat(vec: jnp.ndarray, mode: str = "euler") -> jnp.ndarray:
    """[..., 6] pose vector [t | r] -> [..., 4, 4] SE(3) matrix.

    Parity: reference geometry/pose_utils.py:41 (``pose_vec2mat``) +
    geometry/pose.py:40 (``Pose.from_vec``).
    """
    if mode != "euler":
        raise ValueError(f"Unsupported rotation mode: {mode}")
    t = vec[..., :3]
    rot = euler_to_rotation(vec[..., 3:6])
    top = jnp.concatenate([rot, t[..., :, None]], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=vec.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def invert_pose(T: jnp.ndarray) -> jnp.ndarray:
    """Invert [..., 4, 4] SE(3): (R, t) -> (R^T, -R^T t).

    Parity: reference geometry/pose_utils.py:55 (``invert_pose``).
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    tinv = -Rt @ t
    top = jnp.concatenate([Rt, tinv], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def compose_poses(Ta: jnp.ndarray, Tb: jnp.ndarray) -> jnp.ndarray:
    """Compose two [..., 4, 4] transforms: returns Ta @ Tb.

    Parity: reference geometry/pose.py:75 (``Pose.transform_pose``).
    """
    return Ta @ Tb


def transform_points(T: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply [B, 4, 4] SE(3) to [B, H, W, 3] points (NHWC layout).

    Parity: reference geometry/pose.py:81 (``Pose.transform_points``), which
    operates on [B, 3, H, W]; here points live channels-last, so the transform
    is a single [B, HW, 3] x [B, 3, 3] batched matmul that XLA maps to the MXU.
    """
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    out = jnp.einsum("bij,bhwj->bhwi", R, points, preferred_element_type=points.dtype)
    return out + t[:, None, None, :]


def identity_pose(batch: int, dtype=jnp.float32) -> jnp.ndarray:
    """[B, 4, 4] identity transforms (reference geometry/pose.py:34)."""
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), (batch, 4, 4))
