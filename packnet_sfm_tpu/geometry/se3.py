"""SE(3) Lie-group exp/log maps, pure JAX.

Needed by the bundle-adjustment / pose-graph stage (no counterpart in the
reference, which never refines poses — BASELINE north star capability).
Closed-form Rodrigues formulas with Taylor fallbacks near theta=0. All
branches use the double-where guard so gradients are NaN-free at theta=0
(norm() alone has a NaN gradient at zero).
"""

from __future__ import annotations

import jax.numpy as jnp

_SMALL = 1e-10


def _hat(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> skew-symmetric [..., 3, 3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], -1),
        jnp.stack([wz, z, -wx], -1),
        jnp.stack([-wy, wx, z], -1),
    ], -2)


def _safe_theta(w: jnp.ndarray):
    """Returns (small, theta_safe[..., 1, 1]) with NaN-free gradients."""
    theta_sq = jnp.sum(w * w, axis=-1)[..., None, None]
    small = theta_sq < _SMALL
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    return small, theta, theta_sq


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] axis-angle -> [..., 3, 3] rotation (Rodrigues)."""
    small, theta, theta_sq = _safe_theta(w)
    W = _hat(w)
    W2 = W @ W
    A = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / (theta * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * W2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] rotation -> [..., 3] axis-angle."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)[..., None]
    small = theta < 1e-5
    theta_safe = jnp.where(small, 1.0, theta)
    w_raw = jnp.stack([
        R[..., 2, 1] - R[..., 1, 2],
        R[..., 0, 2] - R[..., 2, 0],
        R[..., 1, 0] - R[..., 0, 1],
    ], -1)
    scale = jnp.where(small, 0.5 + theta ** 2 / 12.0,
                      theta_safe / (2.0 * jnp.sin(theta_safe)))
    return w_raw * scale


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] twist [v | w] -> [..., 4, 4] transform."""
    v, w = xi[..., :3], xi[..., 3:]
    small, theta, theta_sq = _safe_theta(w)
    W = _hat(w)
    W2 = W @ W
    B = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / (theta * theta))
    C = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                  (theta - jnp.sin(theta)) / (theta * theta * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = so3_exp(w)
    V = eye + B * W + C * W2
    t = (V @ v[..., None])[..., 0]
    top = jnp.concatenate([R, t[..., None]], -1)
    bottom = jnp.broadcast_to(
        jnp.array([0, 0, 0, 1], dtype=xi.dtype), top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], -2)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """[..., 4, 4] transform -> [..., 6] twist [v | w]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    small, theta, theta_sq = _safe_theta(w)
    W = _hat(w)
    W2 = W @ W
    # V^{-1} = I - W/2 + (1/theta^2 - (1+cos)/(2 theta sin)) W^2
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 / (theta * theta))
        - (1.0 + jnp.cos(theta)) / (2.0 * theta * jnp.sin(theta)))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    Vinv = eye - 0.5 * W + coef * W2
    v = (Vinv @ t[..., None])[..., 0]
    return jnp.concatenate([v, w], -1)
