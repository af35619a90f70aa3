"""PackNet-SAN (CVPR'21 Sparse Auxiliary Network), flax.linen, NHWC.

Capability parity with reference networks/depth/PackNetSAN01.py: PackNetSlim-
style encoder/decoder split, sparse lidar branch injecting densified features
into the skip pyramid with learned per-level scalar weight/bias
(PackNetSAN01.py:202-206), and the train-time dual pass (rgb-only and rgb+d)
with a consistency loss between skip features (PackNetSAN01.py:231-233).

The Minkowski branch is replaced by the dense masked formulation in
nn/sparse.py — see its docstring for the equivalence argument.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from packnet_sfm_tpu.nn.layers import Conv2dBlock, InvDepthHead, ResidualBlock
from packnet_sfm_tpu.nn.packnet import PackLayerConv3d, UnpackLayerConv3d
from packnet_sfm_tpu.nn.sparse import SparseDepthEncoder
from packnet_sfm_tpu.ops.image import interpolate_image


class SANEncoder(nn.Module):
    """PackNetSlim encoder half (reference PackNetSAN01.py:11-50)."""

    ni: int = 32
    channels: Tuple[int, ...] = (32, 64, 128, 256, 512)
    num_blocks: Tuple[int, ...] = (2, 2, 3, 3)
    d: int = 4
    dropout: Optional[float] = None
    pack_mode: str = "auto"

    @nn.compact
    def __call__(self, rgb, *, train: bool = True):
        n1, n2, n3, n4, n5 = self.channels
        pack_kernel = (5, 3, 3, 3, 3)
        x = Conv2dBlock(self.ni, 5, 1, name="pre_calc")(rgb)
        x1 = Conv2dBlock(n1, 7, 1, name="conv1")(x)
        x1p = PackLayerConv3d(n1, pack_kernel[0], d=self.d, mode=self.pack_mode, name="pack1")(x1)
        x2 = ResidualBlock(n2, self.num_blocks[0], 1, self.dropout, name="conv2")(x1p, train=train)
        x2p = PackLayerConv3d(n2, pack_kernel[1], d=self.d, mode=self.pack_mode, name="pack2")(x2)
        x3 = ResidualBlock(n3, self.num_blocks[1], 1, self.dropout, name="conv3")(x2p, train=train)
        x3p = PackLayerConv3d(n3, pack_kernel[2], d=self.d, mode=self.pack_mode, name="pack3")(x3)
        x4 = ResidualBlock(n4, self.num_blocks[2], 1, self.dropout, name="conv4")(x3p, train=train)
        x4p = PackLayerConv3d(n4, pack_kernel[3], d=self.d, mode=self.pack_mode, name="pack4")(x4)
        x5 = ResidualBlock(n5, self.num_blocks[3], 1, self.dropout, name="conv5")(x4p, train=train)
        x5p = PackLayerConv3d(n5, pack_kernel[4], d=self.d, mode=self.pack_mode, name="pack5")(x5)
        return x5p, [x, x1p, x2p, x3p, x4p]


class SANDecoder(nn.Module):
    """PackNetSlim decoder half (reference PackNetSAN01.py:53-144), version A."""

    version: str = "A"
    ni: int = 32
    channels: Tuple[int, ...] = (32, 64, 128, 256, 512)
    d: int = 4
    out_channels: int = 1

    @nn.compact
    def __call__(self, x5p, skips):
        v = self.version
        ni, no = self.ni, self.out_channels
        n1, n2, n3, n4, n5 = self.channels
        if v == "A":
            n1o, n2o, n3o, n4o, n5o = n1, n2, n3, n4, n5
        else:
            raise ValueError("PackNetSAN supports version A")
        skip1, skip2, skip3, skip4, skip5 = skips

        def up(feat, scale=2):
            return interpolate_image(
                feat, (feat.shape[1] * scale, feat.shape[2] * scale), mode="nearest")

        unpack5 = UnpackLayerConv3d(n5o, 3, d=self.d, name="unpack5")(x5p)
        iconv5 = Conv2dBlock(n5, 3, 1, name="iconv5")(
            jnp.concatenate([unpack5, skip5], -1))
        unpack4 = UnpackLayerConv3d(n4o, 3, d=self.d, name="unpack4")(iconv5)
        iconv4 = Conv2dBlock(n4, 3, 1, name="iconv4")(
            jnp.concatenate([unpack4, skip4], -1))
        disp4 = InvDepthHead(no, name="disp4")(iconv4)
        unpack3 = UnpackLayerConv3d(n3o, 3, d=self.d, name="unpack3")(iconv4)
        iconv3 = Conv2dBlock(n3, 3, 1, name="iconv3")(
            jnp.concatenate([unpack3, skip3, up(disp4)], -1))
        disp3 = InvDepthHead(no, name="disp3")(iconv3)
        unpack2 = UnpackLayerConv3d(n2o, 3, d=self.d, name="unpack2")(iconv3)
        iconv2 = Conv2dBlock(n2, 3, 1, name="iconv2")(
            jnp.concatenate([unpack2, skip2, up(disp3)], -1))
        disp2 = InvDepthHead(no, name="disp2")(iconv2)
        unpack1 = UnpackLayerConv3d(n1o, 3, d=self.d, name="unpack1")(iconv2)
        iconv1 = Conv2dBlock(n1, 3, 1, name="iconv1")(
            jnp.concatenate([unpack1, skip1, up(disp2)], -1))
        disp1 = InvDepthHead(no, name="disp1")(iconv1)
        return [disp1, disp2, disp3, disp4]


class PackNetSAN01(nn.Module):
    """Full PackNet-SAN: returns a dict (reference PackNetSAN01.py:210-243).

    Train + input_depth: {'inv_depths', 'inv_depths_rgbd', 'depth_loss'}.
    Eval: rgb+d pass if input_depth given, else rgb-only.
    """

    version: str = "A"
    dropout: Optional[float] = None
    with_uncertainty: bool = False
    pack_mode: str = "auto"

    @nn.compact
    def __call__(self, rgb, input_depth=None, *, train: bool = True):
        channels = (32, 64, 128, 256, 512)
        encoder = SANEncoder(dropout=self.dropout, pack_mode=self.pack_mode,
                             name="encoder")
        decoder = SANDecoder(version=self.version, name="decoder")
        sparse_enc = SparseDepthEncoder(
            channels=channels, with_uncertainty=self.with_uncertainty,
            name="mconvs")
        weight = self.param("weight", nn.initializers.ones, (5,))
        bias = self.param("bias", nn.initializers.zeros, (5,))

        def run(with_depth: bool):
            x5p, skips = encoder(rgb, train=train)
            if with_depth:
                sfeats = sparse_enc(input_depth, train=train)
                skips = list(skips)
                for i in range(1, 5):
                    skips[i] = skips[i] * weight[i - 1] + sfeats[i - 1] + bias[i - 1]
                x5p_out = x5p * weight[4] + sfeats[4] + bias[4]
            else:
                x5p_out = x5p
            return decoder(x5p_out, skips), list(skips) + [x5p_out]

        if not train:
            inv_depths, _ = run(input_depth is not None)
            return {"inv_depths": inv_depths}

        inv_depths_rgb, feat_rgb = run(False)
        out = {"inv_depths": inv_depths_rgb}
        if input_depth is None:
            return out
        inv_depths_rgbd, feat_rgbd = run(True)
        out["inv_depths_rgbd"] = inv_depths_rgbd
        out["depth_loss"] = sum(
            jnp.mean((jax.lax.stop_gradient(frgbd) - frgb) ** 2)
            for frgbd, frgb in zip(feat_rgbd, feat_rgb)) / len(feat_rgbd)
        return out
