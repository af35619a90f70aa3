"""Supervised inverse-depth losses, NHWC, pure JAX.

Capability parity with reference losses/supervised_loss.py (l1 / mse / berhu /
silog / abs_rel, with a ``sparse-`` prefix that masks gt==0 pixels).

TPU-first: the reference masks with boolean fancy-indexing (dynamic shapes);
here every method is expressed as a mask-weighted reduction with static
shapes, so the whole loss jits and shards.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp

from packnet_sfm_tpu.ops.image import interpolate_image


@dataclasses.dataclass(frozen=True)
class SupervisedLossConfig:
    """Mirrors reference knobs (supervised_loss.py:103-112, default_config.py:107-109)."""

    supervised_method: str = "sparse-l1"
    supervised_num_scales: int = 4


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.clip(jnp.sum(mask), min=1.0)
    return jnp.sum(x * mask) / denom


def _loss_l1(pred, gt, mask):
    return _masked_mean(jnp.abs(pred - gt), mask)


def _loss_mse(pred, gt, mask):
    return _masked_mean((pred - gt) ** 2, mask)


def _loss_abs_rel(pred, gt, mask):
    # Reference: mean(|x - y| / x) with x = prediction (supervised_loss.py:82).
    return _masked_mean(jnp.abs(pred - gt) / jnp.clip(pred, min=1e-6), mask)


def _loss_berhu(pred, gt, mask, threshold: float = 0.2):
    """BerHu (supervised_loss.py:11-53): mean over concat(|d|, d^2 where |d|>c).

    c = threshold * max(pred - gt). The concat-mean equals
    (sum|d| + sum d^2·[|d|>c]) / (N + M) — expressed here with fixed shapes.
    """
    diff = pred - gt
    huber_c = threshold * jnp.max(diff * mask)
    adiff = jnp.abs(diff) * mask
    over = (adiff > huber_c).astype(pred.dtype) * mask
    n = jnp.sum(mask)
    m = jnp.sum(over)
    total = jnp.sum(adiff) + jnp.sum(adiff ** 2 * over)
    return total / jnp.clip(n + m, min=1.0)


def _loss_silog(pred, gt, mask, ratio: float = 10.0, ratio2: float = 0.85):
    """Scale-invariant log loss (supervised_loss.py:55-66)."""
    log_diff = (jnp.log(jnp.clip(pred * ratio, min=1e-9)) -
                jnp.log(jnp.clip(gt * ratio, min=1e-9))) * mask
    n = jnp.clip(jnp.sum(mask), min=1.0)
    silog1 = jnp.sum(log_diff ** 2) / n
    silog2 = ratio2 * (jnp.sum(log_diff) / n) ** 2
    return jnp.sqrt(jnp.clip(silog1 - silog2, min=1e-12)) * ratio


_METHODS = {
    "l1": _loss_l1,
    "mse": _loss_mse,
    "berhu": _loss_berhu,
    "silog": _loss_silog,
    "abs_rel": _loss_abs_rel,
}


def supervised_loss(
    inv_depths: Sequence[jnp.ndarray],
    gt_inv_depth: jnp.ndarray,
    cfg: SupervisedLossConfig,
):
    """Multi-scale supervised loss on inverse depth.

    inv_depths: list of [B, Hs, Ws, 1] predictions; gt_inv_depth: [B, H, W, 1].
    Ground truth is matched to each scale with nearest resize (reference
    forward:149-181 uses match_scales(..., mode='nearest')).

    Returns (loss_scalar, metrics_dict).
    """
    method = cfg.supervised_method
    sparse = method.startswith("sparse")
    suffix = method.split("-")[-1]
    if suffix not in _METHODS:
        raise ValueError(f"Unknown supervised loss {method}")
    fn = _METHODS[suffix]

    n = cfg.supervised_num_scales
    total = 0.0
    for i in range(n):
        pred = inv_depths[i]
        gt = interpolate_image(gt_inv_depth, pred.shape[1:3], mode="nearest")
        mask = (gt > 0).astype(pred.dtype) if sparse else jnp.ones_like(gt)
        total = total + fn(pred, gt, mask)
    loss = total / n
    return loss, {"supervised_loss": loss}
