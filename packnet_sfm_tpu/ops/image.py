"""Image-space ops, NHWC layout, pure JAX.

Capability parity with reference utils/image.py (meshgrid/image_grid:219-283,
flip_lr:43, gradients:85-113, interpolate_image:117, match_scales:178), all
re-expressed channels-last for TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def image_grid(h: int, w: int, dtype=jnp.float32, normalized: bool = False) -> jnp.ndarray:
    """Homogeneous pixel grid [H, W, 3] with entries (u, v, 1).

    Parity: reference utils/image.py:255 (``image_grid``); ours is unbatched —
    broadcast over batch where needed (it's constant-foldable under jit).
    """
    ys = jnp.arange(h, dtype=dtype)
    xs = jnp.arange(w, dtype=dtype)
    if normalized:
        ys = ys / (h - 1)
        xs = xs / (w - 1)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(grid_x)
    return jnp.stack([grid_x, grid_y, ones], axis=-1)


def flip_lr(image: jnp.ndarray) -> jnp.ndarray:
    """Horizontally flip [..., H, W, C] images (reference utils/image.py:43)."""
    return image[..., :, ::-1, :]


def gradient_x(image: jnp.ndarray) -> jnp.ndarray:
    """Finite-difference gradient along W: [B, H, W-1, C] (utils/image.py:85)."""
    return image[:, :, :-1, :] - image[:, :, 1:, :]


def gradient_y(image: jnp.ndarray) -> jnp.ndarray:
    """Finite-difference gradient along H: [B, H-1, W, C] (utils/image.py:99)."""
    return image[:, :-1, :, :] - image[:, 1:, :, :]


def interpolate_image(image: jnp.ndarray, shape: tuple, mode: str = "bilinear") -> jnp.ndarray:
    """Resize [B, H, W, C] to spatial ``shape`` (H', W').

    Parity: reference utils/image.py:117 (``interpolate_image``), which uses
    torch interpolate with align_corners=True for bilinear. jax.image.resize
    ``linear`` uses half-pixel centers (align_corners=False); for parity with
    the reference's align_corners=True we gather via an explicit grid.
    """
    h, w = int(shape[0]), int(shape[1])
    if image.shape[1] == h and image.shape[2] == w:
        return image
    if mode == "nearest":
        return jax.image.resize(image, (image.shape[0], h, w, image.shape[3]), method="nearest")
    # align_corners=True bilinear: src coords are linspace(0, S-1, out)
    return _resize_bilinear_align_corners(image, h, w)


def _resize_bilinear_align_corners(image: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b, ih, iw, c = image.shape
    ys = jnp.linspace(0.0, ih - 1.0, h, dtype=image.dtype)
    xs = jnp.linspace(0.0, iw - 1.0, w, dtype=image.dtype)
    y0 = jnp.clip(jnp.floor(ys), 0, ih - 1)
    x0 = jnp.clip(jnp.floor(xs), 0, iw - 1)
    y1 = jnp.clip(y0 + 1, 0, ih - 1)
    x1 = jnp.clip(x0 + 1, 0, iw - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    y0i, y1i, x0i, x1i = (v.astype(jnp.int32) for v in (y0, y1, x0, x1))
    # Separable gather: rows then columns (two 1D gathers instead of a 2D one).
    top = image[:, y0i, :, :]
    bot = image[:, y1i, :, :]
    rows = top * (1 - wy) + bot * wy
    left = rows[:, :, x0i, :]
    right = rows[:, :, x1i, :]
    return left * (1 - wx) + right * wx


def match_scales(image: jnp.ndarray, shapes: list, mode: str = "bilinear") -> list:
    """Resize ``image`` to each (H, W) in ``shapes``.

    Parity: reference utils/image.py:178 (``match_scales``): returns the same
    array when shapes already match.
    """
    return [interpolate_image(image, s, mode=mode) for s in shapes]
