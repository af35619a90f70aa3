"""Building-block layers for PackNet-style networks, flax.linen, NHWC.

Capability parity with reference networks/layers/packnet/layers01.py:
Conv2D (conv + GroupNorm(16) + ELU), ResidualConv/ResidualBlock, InvDepth
head. Weight init follows the reference (xavier-uniform kernels, zero bias,
layers01.py:98-104 / PackNet01.init_weights).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

_conv_init = nn.initializers.xavier_uniform()


class Conv2dBlock(nn.Module):
    """Conv(k, stride, zero-pad k//2) + GroupNorm(16) + ELU (layers01.py:10-37)."""

    features: int
    kernel_size: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.kernel_size // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(p, p), (p, p)],
            kernel_init=_conv_init,
            dtype=self.dtype,
        )(x)
        x = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=self.dtype)(x)
        return jax.nn.elu(x)


class ResidualConv(nn.Module):
    """Residual unit: two Conv2dBlocks + 1x1-conv shortcut, GN+ELU on the sum
    (layers01.py:40-72)."""

    features: int
    stride: int
    dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = True) -> jnp.ndarray:
        out = Conv2dBlock(self.features, 3, self.stride, self.dtype)(x)
        out = Conv2dBlock(self.features, 3, 1, self.dtype)(out)
        shortcut = nn.Conv(
            self.features, (1, 1), strides=(self.stride, self.stride),
            padding="VALID", kernel_init=_conv_init, dtype=self.dtype,
        )(x)
        if self.dropout:
            shortcut = nn.Dropout(rate=self.dropout, deterministic=not train)(shortcut)
        out = nn.GroupNorm(num_groups=16, epsilon=1e-5, dtype=self.dtype)(out + shortcut)
        return jax.nn.elu(out)


class ResidualBlock(nn.Module):
    """Stack of ResidualConv units; only the first may stride (layers01.py:75-95)."""

    features: int
    num_blocks: int
    stride: int = 1
    dropout: Optional[float] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = True) -> jnp.ndarray:
        x = ResidualConv(self.features, self.stride, self.dropout,
                         self.dtype)(x, train=train)
        for _ in range(1, self.num_blocks):
            x = ResidualConv(self.features, 1, self.dropout,
                             self.dtype)(x, train=train)
        return x


class InvDepthHead(nn.Module):
    """3x3 conv + sigmoid scaled by 1/min_depth (layers01.py:98-122).

    Output is inverse depth in (0, 1/min_depth) — min_depth=0.5 by default.
    """

    features: int = 1
    min_depth: float = 0.5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    kernel_init=_conv_init, dtype=self.dtype)(x)
        # inverse depth head stays in f32 for numeric stability downstream
        return jax.nn.sigmoid(x.astype(jnp.float32)) / self.min_depth
