"""Depth evaluation metrics, pure JAX, static shapes.

Capability parity with reference utils/depth.py:258-324
(``compute_depth_metrics``): 7 metrics (abs_rel, sqr_rel, rmse, rmse_log,
a1, a2, a3), garg crop, min/max-depth validity masking, ground-truth median
scaling, and the flip post-processing fusion (utils/depth.py:229-255).

TPU-first: the reference's boolean fancy-indexing (dynamic shapes) becomes
mask-weighted reductions; the masked median is an exact sort-based lower
median with invalid entries pushed to +inf.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from packnet_sfm_tpu.ops.image import flip_lr, interpolate_image

METRIC_NAMES = ("abs_rel", "sqr_rel", "rmse", "rmse_log", "a1", "a2", "a3")


@dataclasses.dataclass(frozen=True)
class DepthMetricsConfig:
    """Mirrors reference model.params (default_config.py:80-85)."""

    crop: str = "garg"
    min_depth: float = 0.0
    max_depth: float = 80.0
    scale_output: str = "resize"


def _masked_lower_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Exact lower median of ``values`` where mask, matching torch.median.

    values/mask: flat [N]. Invalid entries sort to +inf; the lower median is
    element (n-1)//2 of the sorted valid prefix.
    """
    big = jnp.asarray(jnp.inf, values.dtype)
    sorted_vals = jnp.sort(jnp.where(mask > 0, values, big))
    n = jnp.sum(mask).astype(jnp.int32)
    idx = jnp.maximum((n - 1) // 2, 0)
    return sorted_vals[idx]


def garg_crop_mask(h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Garg crop rectangle as a [H, W] mask (reference utils/depth.py:286-290)."""
    y1, y2 = int(0.40810811 * h), int(0.99189189 * h)
    x1, x2 = int(0.03594771 * w), int(0.96405229 * w)
    m = jnp.zeros((h, w), dtype)
    return m.at[y1:y2, x1:x2].set(1.0)


def compute_depth_metrics_per_sample(
    gt: jnp.ndarray,
    pred: jnp.ndarray,
    cfg: DepthMetricsConfig,
    use_gt_scale: bool = True,
) -> jnp.ndarray:
    """Per-sample 7 depth metrics, [B, 7] (no batch reduction).

    gt/pred: [B, H, W, 1] depth maps (pred is resized to gt resolution).
    Samples with zero valid pixels contribute zero rows (reference
    ``continue`` at utils/depth.py:298-299). The per-sample form is what the
    eval protocol needs: pad rows are masked on the host and rows are
    scattered by dataset index for the cross-process seen-count reduction
    (reference utils/reduce.py:31-80).
    """
    b, h, w, _ = gt.shape
    if pred.shape[1:3] != (h, w):
        if cfg.scale_output == "top-center":
            top = h - pred.shape[1]
            left = (w - pred.shape[2]) // 2
            pred = jnp.pad(pred, ((0, 0), (top, h - pred.shape[1] - top),
                                  (left, w - pred.shape[2] - left), (0, 0)))
        else:
            pred = interpolate_image(pred, (h, w), mode="bilinear")

    gt_f = gt[..., 0].reshape(b, -1)
    pred_f = pred[..., 0].reshape(b, -1)
    valid = ((gt_f > cfg.min_depth) & (gt_f < cfg.max_depth)).astype(gt.dtype)
    if cfg.crop == "garg":
        valid = valid * garg_crop_mask(h, w, gt.dtype).reshape(1, -1)

    def per_sample(gt_i, pred_i, valid_i):
        n = jnp.clip(jnp.sum(valid_i), min=1.0)
        if use_gt_scale:
            med_gt = _masked_lower_median(gt_i, valid_i)
            med_pred = _masked_lower_median(pred_i, valid_i)
            pred_i = pred_i * med_gt / jnp.clip(med_pred, min=1e-6)
        pred_i = jnp.clip(pred_i, cfg.min_depth, cfg.max_depth)
        gt_safe = jnp.where(valid_i > 0, gt_i, 1.0)
        pred_safe = jnp.where(valid_i > 0, pred_i, 1.0)

        thresh = jnp.maximum(gt_safe / pred_safe, pred_safe / gt_safe)
        a1 = jnp.sum((thresh < 1.25) * valid_i) / n
        a2 = jnp.sum((thresh < 1.25 ** 2) * valid_i) / n
        a3 = jnp.sum((thresh < 1.25 ** 3) * valid_i) / n
        diff = (gt_safe - pred_safe) * valid_i
        abs_rel = jnp.sum(jnp.abs(diff) / gt_safe) / n
        sq_rel = jnp.sum(diff ** 2 / gt_safe) / n
        rmse = jnp.sqrt(jnp.sum(diff ** 2) / n)
        rmse_log = jnp.sqrt(
            jnp.sum(((jnp.log(gt_safe) - jnp.log(pred_safe)) * valid_i) ** 2) / n)
        m = jnp.stack([abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3])
        return jnp.where(jnp.sum(valid_i) > 0, m, jnp.zeros(7, gt_i.dtype))

    return jax.vmap(per_sample)(gt_f, pred_f, valid)   # [B, 7]


def compute_depth_metrics(
    gt: jnp.ndarray,
    pred: jnp.ndarray,
    cfg: DepthMetricsConfig,
    use_gt_scale: bool = True,
) -> jnp.ndarray:
    """Batch mean of the 7 depth metrics, [7] (reference
    utils/depth.py:258-324 returns the batch mean)."""
    return jnp.mean(
        compute_depth_metrics_per_sample(gt, pred, cfg, use_gt_scale), axis=0)


def fuse_inv_depth(inv_depth: jnp.ndarray, inv_depth_hat: jnp.ndarray,
                   method: str = "mean") -> jnp.ndarray:
    """Fuse straight and flipped inverse depths (reference utils/depth.py:201)."""
    if method == "mean":
        return 0.5 * (inv_depth + inv_depth_hat)
    if method == "max":
        return jnp.maximum(inv_depth, inv_depth_hat)
    if method == "min":
        return jnp.minimum(inv_depth, inv_depth_hat)
    raise ValueError(f"Unknown post-process method {method}")


def post_process_inv_depth(inv_depth: jnp.ndarray, inv_depth_flipped: jnp.ndarray,
                           method: str = "mean") -> jnp.ndarray:
    """Flip-fusion post-process with 20*(x-0.05) border ramps
    (reference utils/depth.py:229-255). Inputs [B, H, W, 1]."""
    b, h, w, _ = inv_depth.shape
    inv_depth_hat = flip_lr(inv_depth_flipped)
    fused = fuse_inv_depth(inv_depth, inv_depth_hat, method=method)
    xs = jnp.linspace(0.0, 1.0, w, dtype=inv_depth.dtype).reshape(1, 1, w, 1)
    mask = 1.0 - jnp.clip(20.0 * (xs - 0.05), 0.0, 1.0)
    mask_hat = mask[:, :, ::-1, :]
    return (mask_hat * inv_depth + mask * inv_depth_hat
            + (1.0 - mask - mask_hat) * fused)
