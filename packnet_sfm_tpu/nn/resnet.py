"""ResNet encoder (torchvision-compatible topology), flax.linen, NHWC.

Capability parity with reference networks/layers/resnet/resnet_encoder.py
(monodepth2-style): resnet18/34/50/101/152 backbones, multi-image input variant for
pose estimation, fixed input normalization (x - 0.45) / 0.225, and the
5-feature pyramid [relu1, layer1, layer2, layer3, layer4].

The parameter structure is 1:1 mappable from torchvision state_dicts so
ImageNet-pretrained weights can be imported offline
(utils/torch_import.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class _BN(nn.Module):
    """BatchNorm matching torch defaults (momentum 0.1 -> flax 0.9, eps 1e-5)."""

    @nn.compact
    def __call__(self, x, *, train: bool):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5)(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        identity = x
        out = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      kernel_init=_kaiming, name="conv1")(x)
        out = _BN(name="bn1")(out, train=train)
        out = jax.nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                      use_bias=False, kernel_init=_kaiming, name="conv2")(out)
        out = _BN(name="bn2")(out, train=train)
        if self.downsample:
            identity = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, kernel_init=_kaiming,
                               name="downsample_conv")(x)
            identity = _BN(name="downsample_bn")(identity, train=train)
        return jax.nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int           # base width; output is 4x
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool):
        identity = x
        out = nn.Conv(self.features, (1, 1), use_bias=False,
                      kernel_init=_kaiming, name="conv1")(x)
        out = jax.nn.relu(_BN(name="bn1")(out, train=train))
        out = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      kernel_init=_kaiming, name="conv2")(out)
        out = jax.nn.relu(_BN(name="bn2")(out, train=train))
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                      kernel_init=_kaiming, name="conv3")(out)
        out = _BN(name="bn3")(out, train=train)
        if self.downsample:
            identity = nn.Conv(self.features * 4, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, kernel_init=_kaiming,
                               name="downsample_conv")(x)
            identity = _BN(name="downsample_bn")(identity, train=train)
        return jax.nn.relu(out + identity)


_CONFIGS = {
    18: (BasicBlock, (2, 2, 2, 2), 1),
    34: (BasicBlock, (3, 4, 6, 3), 1),
    50: (Bottleneck, (3, 4, 6, 3), 4),
    101: (Bottleneck, (3, 4, 23, 3), 4),
    152: (Bottleneck, (3, 8, 36, 3), 4),
}


class ResNetEncoder(nn.Module):
    """ResNet feature-pyramid encoder (reference resnet_encoder.py:61-97).

    Returns 5 features at strides (2, 4, 8, 16, 32). ``num_input_images`` > 1
    widens conv1 for stacked frames (pose use, resnet_encoder.py:16-58).
    """

    num_layers: int = 18
    num_input_images: int = 1

    @property
    def num_ch_enc(self) -> Tuple[int, ...]:
        _, _, exp = _CONFIGS[self.num_layers]
        return (64, 64 * exp, 128 * exp, 256 * exp, 512 * exp)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = True) -> list:
        block, layers, _ = _CONFIGS[self.num_layers]
        x = (x - 0.45) / 0.225  # fixed normalization, resnet_encoder.py:88
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=_kaiming, name="conv1")(x)
        x = _BN(name="bn1")(x, train=train)
        f0 = jax.nn.relu(x)
        x = nn.max_pool(f0, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        feats = [f0]
        widths = (64, 128, 256, 512)
        for li, (w, n) in enumerate(zip(widths, layers)):
            stride = 1 if li == 0 else 2
            for bi in range(n):
                expansion = 4 if block is Bottleneck else 1
                need_ds = bi == 0 and (stride != 1 or x.shape[-1] != w * expansion)
                x = block(w, stride if bi == 0 else 1, need_ds,
                          name=f"layer{li + 1}_{bi}")(x, train=train)
            feats.append(x)
        return feats


class ConvBlockRefl(nn.Module):
    """3x3 reflect-pad conv + ELU (reference resnet/layers.py:24-55)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        x = nn.Conv(self.features, (3, 3), padding="VALID", name="conv")(x)
        return jax.nn.elu(x)


class Conv3x3Refl(nn.Module):
    """3x3 reflect-pad conv, no activation (reference resnet/layers.py:39)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return nn.Conv(self.features, (3, 3), padding="VALID", name="conv")(x)


def _upsample2(x):
    return jax.image.resize(x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]),
                            method="nearest")


class DepthDecoder(nn.Module):
    """monodepth2 depth decoder (reference resnet/depth_decoder.py:16-64).

    5-level nearest-upsample decoder with skips; sigmoid disp heads at the
    4 finest scales. Returns [disp0 (full res), disp1, disp2, disp3].
    """

    num_ch_dec: Sequence[int] = (16, 32, 64, 128, 256)
    num_output_channels: int = 1
    use_skips: bool = True

    @nn.compact
    def __call__(self, features: list) -> list:
        x = features[-1]
        disps = {}
        for i in range(4, -1, -1):
            x = ConvBlockRefl(self.num_ch_dec[i], name=f"upconv_{i}_0")(x)
            x = _upsample2(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, features[i - 1]], axis=-1)
            x = ConvBlockRefl(self.num_ch_dec[i], name=f"upconv_{i}_1")(x)
            if i < 4:
                disps[i] = jax.nn.sigmoid(
                    Conv3x3Refl(self.num_output_channels, name=f"dispconv_{i}")(x))
        return [disps[0], disps[1], disps[2], disps[3]]


class PoseDecoder(nn.Module):
    """monodepth2 pose decoder (reference resnet/pose_decoder.py:13-53).

    Input: last encoder feature. Output: (axisangle, translation), each
    [B, num_frames, 1, 3], scaled by 0.01.
    """

    num_frames_to_predict_for: int = 2

    @nn.compact
    def __call__(self, last_feature: jnp.ndarray):
        nf = self.num_frames_to_predict_for
        x = jax.nn.relu(nn.Conv(256, (1, 1), name="squeeze")(last_feature))
        x = jax.nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], name="pose_0")(x))
        x = jax.nn.relu(nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], name="pose_1")(x))
        x = nn.Conv(6 * nf, (1, 1), name="pose_2")(x)
        x = jnp.mean(x, axis=(1, 2))
        x = 0.01 * x.reshape(-1, nf, 1, 6)
        return x[..., :3], x[..., 3:]
