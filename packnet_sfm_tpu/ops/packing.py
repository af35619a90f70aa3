"""Space-to-depth packing / depth-to-space unpacking, NHWC.

Parity: reference networks/layers/packnet/layers01.py:126 (``packing``) and
``nn.PixelShuffle`` (layers01.py:203). Channel ordering matters for weight
parity: the reference packs NCHW to channel index ``c*r*r + ry*r + rx``
(c major, then ry, then rx); we keep the identical ordering in NHWC so a
following conv sees the same channel semantics. ``depth_to_space`` is the
exact inverse (PixelShuffle semantics).

These reshape+transpose pairs compile to pure layout ops that XLA fuses into
the surrounding convolutions — no materialized copies on TPU in the common
case; the Pallas fused pack-conv kernel (ops/pallas/) removes the rest.
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/r, W/r, C*r*r], channel order (c, ry, rx)."""
    b, h, w, c = x.shape
    oh, ow = h // r, w // r
    x = x.reshape(b, oh, r, ow, r, c)          # [B, oh, ry, ow, rx, C]
    x = x.transpose(0, 1, 3, 5, 2, 4)          # [B, oh, ow, C, ry, rx]
    return x.reshape(b, oh, ow, c * r * r)


def depth_to_space(x: jnp.ndarray, r: int = 2) -> jnp.ndarray:
    """[B, H, W, C*r*r] (channel order (c, ry, rx)) -> [B, H*r, W*r, C]."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)            # [B, h, w, C, ry, rx]
    x = x.transpose(0, 1, 4, 2, 5, 3)          # [B, h, ry, w, rx, C]
    return x.reshape(b, h * r, w * r, c)
