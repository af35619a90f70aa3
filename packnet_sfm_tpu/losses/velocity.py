"""Velocity (metric-scale) supervision loss, pure JAX.

Parity: reference losses/velocity_loss.py: | ‖t_pred‖ − ‖t_gt‖ | averaged over
batch and context frames. Provides weak metric-scale supervision from GPS/IMU
translation magnitudes.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def velocity_loss(
    pred_poses: Sequence[jnp.ndarray],
    gt_pose_context: Sequence[jnp.ndarray],
):
    """pred_poses / gt_pose_context: lists of [B, 4, 4] transforms per context.

    Returns (loss_scalar, metrics_dict).
    """
    total = 0.0
    for pred, gt in zip(pred_poses, gt_pose_context):
        pred_t = jnp.linalg.norm(pred[:, :3, 3], axis=-1)
        gt_t = jnp.linalg.norm(gt[:, :3, 3], axis=-1)
        total = total + jnp.mean(jnp.abs(pred_t - gt_t))
    loss = total / len(gt_pose_context)
    return loss, {"velocity_loss": loss}
