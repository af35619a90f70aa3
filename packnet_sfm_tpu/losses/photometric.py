"""Self-supervised multiview photometric loss, NHWC, pure JAX.

Capability parity with reference losses/multiview_photometric_loss.py
(MultiViewPhotometricLoss.forward:287-344): per-scale view-synthesis warp,
L1+SSIM blend, optional std-clipping, min/mean reduction across context
(+ automask identity-reprojection terms), edge-aware smoothness.

TPU-first design notes:
- The context dimension is stacked, not Python-looped, wherever the math is
  identical per frame; XLA then batches the warps into one fused program.
- All shapes are static; scale count is a static argument resolved by the
  trainer (see losses/progressive.py), so everything jits cleanly.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp

from packnet_sfm_tpu.geometry.camera import Camera, scale_intrinsics, view_synthesis
from packnet_sfm_tpu.losses.smoothness import smoothness_loss
from packnet_sfm_tpu.ops.image import match_scales
from packnet_sfm_tpu.ops.ssim import ssim_loss


@dataclasses.dataclass(frozen=True)
class MultiViewPhotometricConfig:
    """Mirrors the reference loss knobs (multiview_photometric_loss.py:91-114)."""

    num_scales: int = 4
    ssim_loss_weight: float = 0.85
    smooth_loss_weight: float = 0.001
    C1: float = 1e-4
    C2: float = 9e-4
    photometric_reduce_op: str = "min"
    clip_loss: float = 0.0
    automask_loss: bool = True
    padding_mode: str = "zeros"

    def __post_init__(self):
        if self.automask_loss and self.photometric_reduce_op != "min":
            raise ValueError("automasking requires photometric_reduce_op='min'")


def inv2depth(inv_depth: jnp.ndarray) -> jnp.ndarray:
    """Invert inverse depth with 1e-6 clamp (reference utils/depth.py:103)."""
    return 1.0 / jnp.clip(inv_depth, min=1e-6)


def _photometric_map(
    est: jnp.ndarray, ref: jnp.ndarray, cfg: MultiViewPhotometricConfig
) -> jnp.ndarray:
    """Per-pixel L1+SSIM photometric residual [B, H, W, 1].

    Parity: reference calc_photometric_loss:188-223 (channel-mean of each term,
    then optional mean+k*std clipping).
    """
    l1 = jnp.mean(jnp.abs(est - ref), axis=-1, keepdims=True)
    if cfg.ssim_loss_weight > 0.0:
        s = jnp.mean(ssim_loss(est, ref, cfg.C1, cfg.C2), axis=-1, keepdims=True)
        loss = cfg.ssim_loss_weight * s + (1.0 - cfg.ssim_loss_weight) * l1
    else:
        loss = jnp.abs(est - ref)
    if cfg.clip_loss > 0.0:
        mean, std = jnp.mean(loss), jnp.std(loss)
        loss = jnp.clip(loss, max=mean + cfg.clip_loss * std)
    return loss


def multiview_photometric_loss(
    image: jnp.ndarray,
    context: Sequence[jnp.ndarray],
    inv_depths: Sequence[jnp.ndarray],
    K: jnp.ndarray,
    poses: Sequence[jnp.ndarray],
    cfg: MultiViewPhotometricConfig,
    ref_K: jnp.ndarray | None = None,
):
    """Compute the self-supervised photometric loss.

    Parameters
    ----------
    image : [B, H, W, 3] target frame (un-jittered original).
    context : list of [B, H, W, 3] temporal context frames.
    inv_depths : list of [B, Hs, Ws, 1] multi-scale inverse depth of target.
    K : [B, 3, 3] intrinsics (target); ``ref_K`` defaults to K.
    poses : list of [B, 4, 4] target->context transforms (one per context).

    Returns (loss_scalar, metrics_dict).
    Parity: reference MultiViewPhotometricLoss.forward:287-344.
    """
    if ref_K is None:
        ref_K = K
    n = cfg.num_scales
    inv_depths = list(inv_depths)[:n]
    full_w = image.shape[2]
    shapes = [d.shape[1:3] for d in inv_depths]
    images = match_scales(image, shapes)
    depths = [inv2depth(d) for d in inv_depths]

    # photometric_losses[i] collects [B, Hs, Ws, 1] maps across contexts
    # (+ identity terms when automasking), then reduces with min/mean.
    #
    # All contexts — and, when automasking, their identity-reprojection
    # terms — are stacked on the batch axis so each scale runs ONE warp and
    # ONE L1+SSIM chain instead of 2·n_ctx small ones (the multiscale loss
    # tail is launch-bound on the small scales: docs/STATUS.md round-3 perf
    # notes). Elementwise math is identical; only kernel batching changes.
    # clip_loss pools its mean/std statistics per map, so it falls back to
    # the per-context path.
    photometric_losses = [[] for _ in range(n)]
    n_ctx = len(context)
    b = image.shape[0]
    if cfg.clip_loss == 0.0:
        poses_2 = jnp.concatenate(list(poses), axis=0)          # [n_ctx*B,4,4]
        for i in range(n):
            h, w = shapes[i]
            sf = w / float(full_w)
            K_s = scale_intrinsics(K.astype(jnp.float32), sf)
            refK_s = scale_intrinsics(ref_K.astype(jnp.float32), sf)
            refs2 = jnp.concatenate(
                [match_scales(r, [shapes[i]])[0] for r in context], axis=0)
            depth2 = jnp.concatenate([depths[i]] * n_ctx, axis=0)
            cam2 = Camera(K=jnp.concatenate([K_s] * n_ctx, axis=0))
            ref_cam2 = Camera(K=jnp.concatenate([refK_s] * n_ctx, axis=0),
                              Tcw=poses_2)
            warped2 = view_synthesis(refs2, depth2, ref_cam2, cam2,
                                     padding_mode=cfg.padding_mode)
            est = jnp.concatenate([warped2, refs2], axis=0) \
                if cfg.automask_loss else warped2
            tgt = jnp.concatenate([images[i]] * (est.shape[0] // b), axis=0)
            pm = _photometric_map(est, tgt, cfg)
            photometric_losses[i] = [pm[k * b:(k + 1) * b]
                                     for k in range(est.shape[0] // b)]
    else:
        cams = [Camera(K=scale_intrinsics(
            K.astype(jnp.float32), w / float(full_w))) for (h, w) in shapes]
        for ref_image, pose in zip(context, poses):
            for i in range(n):
                h, w = shapes[i]
                sf = w / float(full_w)
                ref_cam = Camera(
                    K=scale_intrinsics(ref_K.astype(jnp.float32), sf), Tcw=pose)
                warped = view_synthesis(
                    match_scales(ref_image, [shapes[i]])[0],
                    depths[i], ref_cam, cams[i], padding_mode=cfg.padding_mode,
                )
                photometric_losses[i].append(
                    _photometric_map(warped, images[i], cfg))
            if cfg.automask_loss:
                ref_scaled = match_scales(ref_image, shapes)
                for i in range(n):
                    photometric_losses[i].append(
                        _photometric_map(ref_scaled[i], images[i], cfg)
                    )

    def reduce_one(losses: list) -> jnp.ndarray:
        if cfg.photometric_reduce_op == "mean":
            return sum(jnp.mean(l) for l in losses) / len(losses)
        if cfg.photometric_reduce_op == "min":
            return jnp.mean(jnp.min(jnp.concatenate(losses, axis=-1), axis=-1))
        raise ValueError(f"Unknown photometric_reduce_op {cfg.photometric_reduce_op}")

    photometric_loss = sum(reduce_one(photometric_losses[i]) for i in range(n)) / n
    metrics = {"photometric_loss": photometric_loss}

    loss = photometric_loss
    if cfg.smooth_loss_weight > 0.0:
        s_loss = smoothness_loss(inv_depths, images, cfg.smooth_loss_weight)
        metrics["smoothness_loss"] = s_loss
        loss = loss + s_loss
    return loss, metrics
