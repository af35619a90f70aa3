"""Sparsity-aware convolution stack: the TPU-native MinkowskiEngine
equivalent (SURVEY §2.9 / §7.3).

The reference's lidar branch uses MinkowskiEngine coordinate-hash sparse
convolutions (networks/layers/minkowski_encoder.py). TPUs are dense-systolic
machines: coordinate hashing and dynamic gather/scatter run orders of
magnitude below MXU speed-of-light. On 2D lidar depth maps the *exact same
math* can be expressed densely:

- active-site set == validity mask [B, H, W, 1];
- a Minkowski conv (sum over active neighbors, output on active sites) ==
  dense conv over (features * mask), output re-masked;
- MinkowskiBatchNorm == batch norm whose statistics are computed over active
  sites only;
- MinkowskiMaxPooling(3, stride 2) == masked max-pool with mask = any-valid;
- densify == multiply by mask (inactive sites are zero by construction).

This keeps every op on the MXU/VPU with static shapes, and is numerically
equivalent on these inputs (verified in tests/test_sparse.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_conv_init = nn.initializers.xavier_uniform()


def sparsify_depth(depth: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, H, W, 1] depth -> (features, mask): the dense analogue of
    reference minkowski.py:32 (``sparsify_depth``)."""
    mask = (depth > 0).astype(depth.dtype)
    return depth * mask, mask


def masked_max_pool(x: jnp.ndarray, mask: jnp.ndarray, window: int = 3,
                    stride: int = 2) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Max-pool over valid entries only; new mask = any-valid in window."""
    neg = jnp.finfo(x.dtype).min
    xm = jnp.where(mask > 0, x, neg)
    p = window // 2
    pooled = jax.lax.reduce_window(
        xm, neg, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (p, p), (p, p), (0, 0)),
    )
    new_mask = jax.lax.reduce_window(
        mask, 0.0, jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (p, p), (p, p), (0, 0)),
    )
    return jnp.where(new_mask > 0, pooled, 0.0), new_mask


class MaskedBatchNorm(nn.Module):
    """BatchNorm with statistics over active sites only (MinkowskiBatchNorm
    equivalent). torch BN defaults: momentum 0.1, eps 1e-5."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, *, train: bool):
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        if train:
            n = jnp.clip(jnp.sum(mask), min=1.0)
            mean = jnp.sum(x * mask, axis=(0, 1, 2)) / n
            var = jnp.sum(((x - mean) ** 2) * mask, axis=(0, 1, 2)) / n
            if not self.is_initializing():
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
                ra_var.value = 0.9 * ra_var.value + 0.1 * var
        else:
            mean, var = ra_mean.value, ra_var.value
        out = (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return out * mask


class SparseConv(nn.Module):
    """One Minkowski conv: dense conv over masked features, output re-masked."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        p = self.kernel_size // 2
        out = nn.Conv(self.features, (self.kernel_size,) * 2,
                      padding=[(p, p), (p, p)], kernel_init=_conv_init)(x * mask)
        return out * mask


class SparseConvBlock(nn.Module):
    """Three parallel sparse conv paths summed + BN + ReLU, with optional
    stride-2 masked max-pool (reference MinkConv2D, minkowski_encoder.py:10-86).
    """

    features: int
    kernel_size: int
    stride: int = 2
    with_uncertainty: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray, *, train: bool = True):
        if self.stride != 1:
            x, mask = masked_max_pool(x, mask, 3, self.stride)
        f, k = self.features, self.kernel_size
        # layer1: single conv
        x1 = SparseConv(f, k, name="l1_conv0")(x, mask)
        # layer2: conv-BN-ReLU-conv
        x2 = SparseConv(2 * f, k, name="l2_conv0")(x, mask)
        x2 = jax.nn.relu(MaskedBatchNorm(name="l2_bn0")(x2, mask, train=train)) * mask
        x2 = SparseConv(f, k, name="l2_conv1")(x2, mask)
        # layer3: conv-BN-ReLU-conv-BN-ReLU-conv
        x3 = SparseConv(2 * f, k, name="l3_conv0")(x, mask)
        x3 = jax.nn.relu(MaskedBatchNorm(name="l3_bn0")(x3, mask, train=train)) * mask
        x3 = SparseConv(2 * f, k, name="l3_conv1")(x3, mask)
        x3 = jax.nn.relu(MaskedBatchNorm(name="l3_bn1")(x3, mask, train=train)) * mask
        x3 = SparseConv(f, k, name="l3_conv2")(x3, mask)

        out = jax.nn.relu(
            MaskedBatchNorm(name="final_bn")(x1 + x2 + x3, mask, train=train)) * mask
        unc = None
        if self.with_uncertainty:
            unc = jax.nn.sigmoid(SparseConv(1, 3, name="unc_conv")(out, mask)) * mask
        return unc, out, mask


class SparseDepthEncoder(nn.Module):
    """Cascade of SparseConvBlocks walking the feature pyramid.

    Parity: reference MinkowskiEncoder (minkowski_encoder.py:88-131). Stateless
    (TPU-first): ``__call__`` takes the sparse depth once and returns the
    densified feature for every level in one pass, instead of the reference's
    stateful ``prep``/``__call__`` walk.
    """

    channels: Sequence[int]          # e.g. (32, 64, 128, 256, 512)
    with_uncertainty: bool = False

    @nn.compact
    def __call__(self, input_depth: jnp.ndarray, *, train: bool = True) -> list:
        kernel_sizes = [5, 5] + [3] * (len(self.channels) - 1)
        feats, mask = sparsify_depth(input_depth)
        outputs = []
        for i, ch in enumerate(self.channels):
            unc, feats, mask = SparseConvBlock(
                ch, kernel_sizes[i], stride=2,
                with_uncertainty=self.with_uncertainty,
                name=f"block{i}")(feats, mask, train=train)
            if self.with_uncertainty and unc is not None:
                outputs.append(unc * feats)   # densify_add_features_unc path
            else:
                outputs.append(feats)         # densify == already dense+masked
        return outputs
