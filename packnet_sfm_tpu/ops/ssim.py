"""SSIM distance for photometric losses, NHWC, pure JAX.

Parity: reference losses/multiview_photometric_loss.py:14-53 (``SSIM``):
3x3 average pooling over reflection-padded inputs, C1=1e-4, C2=9e-4.
XLA fuses the 5 pooling ops; on TPU the 3x3 mean is a reduce_window that maps
to the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _avg_pool3_reflect(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/stride-1 average pool after 1px reflection pad ([B, H, W, C] -> same)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    s = jax.lax.reduce_window(
        xp, 0.0, jax.lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding="VALID",
    )
    return s / 9.0


def ssim(x: jnp.ndarray, y: jnp.ndarray, c1: float = 1e-4, c2: float = 9e-4) -> jnp.ndarray:
    """SSIM similarity map between two [B, H, W, C] images (higher = more similar)."""
    mu_x = _avg_pool3_reflect(x)
    mu_y = _avg_pool3_reflect(y)
    mu_xy = mu_x * mu_y
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    sigma_x = _avg_pool3_reflect(x * x) - mu_xx
    sigma_y = _avg_pool3_reflect(y * y) - mu_yy
    sigma_xy = _avg_pool3_reflect(x * y) - mu_xy
    num = (2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
    return num / den


def ssim_loss(x: jnp.ndarray, y: jnp.ndarray, c1: float = 1e-4, c2: float = 9e-4) -> jnp.ndarray:
    """Clipped SSIM distance in [0, 1] (reference multiview_photometric_loss.py:169-186)."""
    return jnp.clip((1.0 - ssim(x, y, c1, c2)) * 0.5, 0.0, 1.0)
