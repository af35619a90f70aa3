"""RaySurfaceResNet: depth + learned ray-surface residual (NRS).

Parity: reference networks/depth/RaySurfaceResNet.py + layers/resnet/
raysurface_decoder.py: shared ResNet encoder, monodepth2 depth decoder, and a
tanh 3-channel ray-surface decoder at full resolution only.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from packnet_sfm_tpu.nn.depth_resnet import disp_to_depth
from packnet_sfm_tpu.nn.resnet import (
    ConvBlockRefl,
    Conv3x3Refl,
    DepthDecoder,
    ResNetEncoder,
    _upsample2,
)


class RaySurfaceDecoder(nn.Module):
    """Same topology as DepthDecoder but tanh, 3 channels, scale 0 only."""

    num_ch_dec: tuple = (16, 32, 64, 128, 256)

    @nn.compact
    def __call__(self, features: list) -> jnp.ndarray:
        x = features[-1]
        for i in range(4, -1, -1):
            x = ConvBlockRefl(self.num_ch_dec[i], name=f"upconv_{i}_0")(x)
            x = _upsample2(x)
            if i > 0:
                x = jnp.concatenate([x, features[i - 1]], axis=-1)
            x = ConvBlockRefl(self.num_ch_dec[i], name=f"upconv_{i}_1")(x)
        return jax.nn.tanh(Conv3x3Refl(3, name="raysurfconv_0")(x))


class RaySurfaceResNet(nn.Module):
    """Returns ({'inv_depths': [...4 scales], 'ray_surface': [B,H,W,3]})."""

    version: str = "18"
    min_depth: float = 0.1
    max_depth: float = 100.0

    @nn.compact
    def __call__(self, rgb: jnp.ndarray, *, train: bool = True) -> dict:
        # version is "<depth>" or "<depth>pt" (reference DepthResNet.py:30
        # parses [:2]; we accept 3-digit 101/152 as well)
        num_layers = int(self.version.rstrip('pt') or '18')
        feats = ResNetEncoder(num_layers=num_layers, name="encoder")(rgb, train=train)
        disps = DepthDecoder(name="decoder")(feats)
        rays = RaySurfaceDecoder(name="ray_decoder")(feats)
        inv_depths = [disp_to_depth(d, self.min_depth, self.max_depth)[0]
                      for d in disps]
        return {"inv_depths": inv_depths, "ray_surface": rays}
