"""Edge-aware inverse-depth smoothness, NHWC, pure JAX.

Parity: reference utils/depth.py:146-198 (``inv_depths_normalize``,
``calc_smoothness``) and losses/multiview_photometric_loss.py:257-283
(``calc_smoothness_loss``).
"""

from __future__ import annotations

import jax.numpy as jnp

from packnet_sfm_tpu.ops.image import gradient_x, gradient_y


def normalize_inv_depth(inv_depth: jnp.ndarray) -> jnp.ndarray:
    """Divide by per-image spatial mean (reference utils/depth.py:146)."""
    mean = jnp.mean(inv_depth, axis=(1, 2), keepdims=True)
    return inv_depth / jnp.clip(mean, min=1e-6)


def calc_smoothness(inv_depth: jnp.ndarray, image: jnp.ndarray):
    """Edge-weighted inverse-depth gradients for one scale.

    inv_depth: [B, H, W, 1], image: [B, H, W, 3] at the same scale.
    Returns (smoothness_x [B, H, W-1, 1], smoothness_y [B, H-1, W, 1]).
    Parity: reference utils/depth.py:165-198.
    """
    inv_norm = normalize_inv_depth(inv_depth)
    dx = gradient_x(inv_norm)
    dy = gradient_y(inv_norm)
    wx = jnp.exp(-jnp.mean(jnp.abs(gradient_x(image)), axis=-1, keepdims=True))
    wy = jnp.exp(-jnp.mean(jnp.abs(gradient_y(image)), axis=-1, keepdims=True))
    return dx * wx, dy * wy


def smoothness_loss(inv_depths: list, images: list, weight: float) -> jnp.ndarray:
    """Multi-scale smoothness loss with 1/2^i scale decay.

    Parity: reference multiview_photometric_loss.py:257-283 — note the
    reference SUMS |sx|.mean() + |sy|.mean() per scale (no /2); an earlier
    version here halved it, which halved the effective smoothness weight
    (caught by the lockstep trajectory-parity harness, tests/test_lockstep.py).
    """
    n = len(inv_depths)
    total = 0.0
    for i in range(n):
        sx, sy = calc_smoothness(inv_depths[i], images[i])
        total = total + (jnp.mean(jnp.abs(sx)) + jnp.mean(jnp.abs(sy))) / (2 ** i)
    return weight * total / n
