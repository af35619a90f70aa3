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


class FastGroupNorm(nn.Module):
    """GroupNorm without the grouped reshape (a TPU lane-padding trap).

    flax's nn.GroupNorm materializes [..., G, C/G]; with C/G = 4..32 that
    minor dim lane-pads up to 32x, and the GN chains were the largest
    single cost of the PackNet train step (measured: a 2-block residual
    stack at [8,96,320,64] spent ~12 ms, ~20x its bandwidth bound; see
    docs/STATUS.md round-3 perf notes). This computes identical statistics
    from [B, C] f32 moment reductions (the group fold happens on the tiny
    [B, C] tensor, never on the activation), then applies one per-channel
    affine that XLA fuses into the neighboring elementwise ops.

    Params ('scale'/'bias', shape [C]) match nn.GroupNorm, so checkpoints
    and the torch importer are unchanged.
    """

    num_groups: int = 16
    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        g = self.num_groups
        assert c % g == 0, (c, g)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        red = tuple(range(1, x.ndim - 1))
        xf = x.astype(jnp.float32)
        # One-pass E[x²]−E[x]² cancels catastrophically once |mean| >> std
        # (f32 loses the variance entirely around mean/std ≈ 1e3). In f32
        # compute, center on a cheap per-group shift first — the mean of the
        # middle spatial row (one contiguous 1/H-sized read) — then the
        # one-pass formula runs on centered values; the residual |shift−mean|
        # is bounded by the data range so the (1 + Δ²/σ²)·eps amplification
        # stays harmless (test_layers.py pins adversarial cases). In bf16
        # compute the shift is skipped (measured ~3.5% of the whole train
        # step): the 8-bit-mantissa input quantization injects variance
        # ~(mean/443)² — for any |mean|/std large enough for f32 cancellation
        # to matter, the bf16 input has already destroyed the information the
        # shift would preserve.
        f32_compute = self.dtype is None or self.dtype == jnp.float32
        if f32_compute and x.ndim >= 3 and x.shape[1] > 1:
            mid = x.shape[1] // 2
            shift = jnp.mean(
                xf[:, mid].reshape(x.shape[0], -1, g, c // g), axis=(1, 3))
        else:
            shift = jnp.zeros((x.shape[0], g), jnp.float32)
        sh_full = jnp.repeat(shift, c // g, axis=1).reshape(
            (x.shape[0],) + (1,) * (x.ndim - 2) + (c,))
        xc = xf - sh_full
        s1 = jnp.sum(xc, axis=red)                    # [B, C]
        s2 = jnp.sum(xc * xc, axis=red)
        n_spatial = 1
        for ax in red:
            n_spatial *= x.shape[ax]
        n = n_spatial * (c // g)
        gs1 = s1.reshape(-1, g, c // g).sum(-1)       # [B, G]
        gs2 = s2.reshape(-1, g, c // g).sum(-1)
        dmean = gs1 / n
        mean = shift + dmean
        var = jnp.maximum(gs2 / n - dmean * dmean, 0.0)
        rstd = jax.lax.rsqrt(var + self.epsilon)
        mean_c = jnp.repeat(mean, c // g, axis=1)     # [B, C]
        rstd_c = jnp.repeat(rstd, c // g, axis=1)
        sc = scale.astype(jnp.float32)[None] * rstd_c
        bi = bias.astype(jnp.float32)[None] - mean_c * sc
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
        out = xf * sc.reshape(shape) + bi.reshape(shape)
        return out.astype(self.dtype or x.dtype)


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
        x = FastGroupNorm(num_groups=16, epsilon=1e-5, dtype=self.dtype,
                          name="GroupNorm_0")(x)
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
        out = FastGroupNorm(num_groups=16, epsilon=1e-5, dtype=self.dtype,
                            name="GroupNorm_0")(out + shortcut)
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
