"""Generic (ray-surface) multiview photometric loss — NRS training.

Capability parity with reference losses/generic_multiview_photometric_loss.py:
same L1+SSIM/clip/reduce/smoothness structure as the pinhole loss, but view
synthesis warps through ``GenericCamera`` ray surfaces. The predicted
ray-surface residual is blended with a canonical template annealed by
``coeff = min(((100*progress)^(4/3))/100, 1)`` (reference :192-194) and
re-normalized to unit rays.

``progress`` is a traced scalar here (temperature and blend coefficient are
smooth functions of it), so no recompiles across epochs.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp

from packnet_sfm_tpu.geometry.camera_generic import (
    GenericCamera,
    view_synthesis_generic,
)
from packnet_sfm_tpu.losses.photometric import (
    MultiViewPhotometricConfig,
    _photometric_map,
    inv2depth,
)
from packnet_sfm_tpu.losses.smoothness import smoothness_loss
from packnet_sfm_tpu.ops.image import match_scales


@dataclasses.dataclass(frozen=True)
class GenericPhotometricConfig(MultiViewPhotometricConfig):
    """Generic-loss defaults (generic_multiview_photometric_loss.py:127-130)."""

    num_scales: int = 1
    patch: int = 20
    downsample_projection: bool = True


def blend_ray_surface(canonical: jnp.ndarray, residual: jnp.ndarray,
                      progress) -> jnp.ndarray:
    """canonical [H, W, 3] + coeff * residual [B, H, W, 3], unit-normalized."""
    coeff = jnp.minimum(((100.0 * progress) ** (4.0 / 3.0)) / 100.0, 1.0)
    rays = canonical[None] + coeff * residual
    return rays / jnp.clip(jnp.linalg.norm(rays, axis=-1, keepdims=True), min=1e-8)


def generic_multiview_photometric_loss(
    image: jnp.ndarray,
    context: Sequence[jnp.ndarray],
    inv_depths: Sequence[jnp.ndarray],
    ray_surface_residual: jnp.ndarray,
    canonical_rays: jnp.ndarray,
    poses: Sequence[jnp.ndarray],
    cfg: GenericPhotometricConfig,
    progress,
    temperature: float,
):
    """Returns (loss, metrics). ``temperature`` is static (host-resolved);
    the blend coefficient is traced from ``progress``."""
    n = cfg.num_scales
    inv_depths = list(inv_depths)[:n]
    shapes = [d.shape[1:3] for d in inv_depths]
    images = match_scales(image, shapes)
    depths = [inv2depth(d) for d in inv_depths]

    rays = blend_ray_surface(canonical_rays, ray_surface_residual, progress)

    photometric_losses = [[] for _ in range(n)]
    for ref_image, pose in zip(context, poses):
        for i in range(n):
            cam = GenericCamera(rays=rays)
            ref_cam = GenericCamera(rays=rays, Tcw=pose)
            warped = view_synthesis_generic(
                match_scales(ref_image, [shapes[i]])[0], depths[i],
                ref_cam, cam, temperature, padding_mode=cfg.padding_mode)
            photometric_losses[i].append(_photometric_map(warped, images[i], cfg))
        if cfg.automask_loss:
            ref_scaled = match_scales(ref_image, shapes)
            for i in range(n):
                photometric_losses[i].append(
                    _photometric_map(ref_scaled[i], images[i], cfg))

    def reduce_one(losses):
        if cfg.photometric_reduce_op == "mean":
            return sum(jnp.mean(l) for l in losses) / len(losses)
        if cfg.photometric_reduce_op == "min":
            return jnp.mean(jnp.min(jnp.concatenate(losses, axis=-1), axis=-1))
        raise ValueError(cfg.photometric_reduce_op)

    photometric_loss = sum(reduce_one(photometric_losses[i]) for i in range(n)) / n
    metrics = {"photometric_loss": photometric_loss}
    loss = photometric_loss
    if cfg.smooth_loss_weight > 0.0:
        s = smoothness_loss(inv_depths, images, cfg.smooth_loss_weight)
        metrics["smoothness_loss"] = s
        loss = loss + s
    return loss, metrics
