"""DepthResNet: ResNet encoder + monodepth2 decoder + disp scaling.

Parity: reference networks/depth/DepthResNet.py. Version string 'XY[pt]'
selects layer count (18/34/50); pretrained weights are imported offline via
utils/torch_import (no downloads here).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from packnet_sfm_tpu.nn.resnet import DepthDecoder, ResNetEncoder


def disp_to_depth(disp: jnp.ndarray, min_depth: float = 0.1, max_depth: float = 100.0):
    """Sigmoid disp -> (scaled_disp, depth) (reference resnet/layers.py:12-21)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return scaled_disp, 1.0 / scaled_disp


class DepthResNet(nn.Module):
    """Returns 4-scale inverse depths (scaled disp), finest first."""

    version: str = "18"
    min_depth: float = 0.1
    max_depth: float = 100.0

    @nn.compact
    def __call__(self, rgb: jnp.ndarray, *, train: bool = True) -> list:
        # version is "<depth>" or "<depth>pt" (reference DepthResNet.py:30
        # parses [:2]; we accept 3-digit 101/152 as well)
        num_layers = int(self.version.rstrip('pt') or '18')
        feats = ResNetEncoder(num_layers=num_layers, name="encoder")(rgb, train=train)
        disps = DepthDecoder(name="decoder")(feats)
        return [disp_to_depth(d, self.min_depth, self.max_depth)[0] for d in disps]
