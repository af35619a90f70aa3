"""Differentiable bilinear warp sampling (grid_sample equivalent), NHWC.

Capability parity with torch ``F.grid_sample(..., mode='bilinear',
align_corners=True)`` as used by the reference view-synthesis path
(geometry/camera_utils.py:58). Forward is 4 clipped gathers + lerp; the
transposed gradient (scatter-add) falls out of JAX autodiff on the gathers.

TPU notes: XLA lowers ``take_along_axis`` on a flattened [B, HW, C] image to a
dynamic-gather that tiles well when C is the minor (lane) dimension — another
reason the whole framework is channels-last.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(
    image: jnp.ndarray,
    coords: jnp.ndarray,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Sample ``image`` [B, H, W, C] at ``coords`` [B, H', W', 2].

    ``coords[..., 0]`` is x and ``coords[..., 1]`` is y, normalized to [-1, 1]
    with align_corners=True semantics (-1 -> pixel 0, +1 -> pixel S-1).

    padding_mode:
      'zeros'  — out-of-bounds taps contribute 0 (torch 'zeros').
      'border' — coordinates clamp to the edge (torch 'border').
    """
    b, h, w, c = image.shape
    x = (coords[..., 0] + 1.0) * 0.5 * (w - 1)
    y = (coords[..., 1] + 1.0) * 0.5 * (h - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(ix, iy):
        ix_c = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iy_c = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        flat_idx = (iy_c * w + ix_c).reshape(b, -1)  # [B, H'W']
        flat_img = image.reshape(b, h * w, c)
        out = jnp.take_along_axis(flat_img, flat_idx[..., None], axis=1)
        out = out.reshape(b, coords.shape[1], coords.shape[2], c)
        if padding_mode == "zeros":
            valid = ((ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1))
            out = out * valid[..., None].astype(image.dtype)
        return out

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
