"""PackNet depth networks (CVPR'20), flax.linen, NHWC.

Capability parity with reference networks/depth/PackNet01.py and
PackNetSlim01.py plus the 3D pack/unpack layers (layers01.py:213-287),
re-designed TPU-first:

- space-to-depth / depth-to-space are pure layout ops fused by XLA
  (ops/packing.py);
- the 3x3x3 conv over packed channels is computed in a folded layout
  (ChannelConv3d) that never materializes a small-minor-dim tensor — see its
  docstring for the measured 16x lane-padding blowup this avoids;
- pack/unpack layers rematerialize in backward (nn.remat) so their folded
  intermediates don't dominate HBM.

Architecture summary (PackNet01, version A/B, PackNet01.py:25-104):
encoder = pre_calc Conv(5) -> [conv_i (residual) -> pack_i] x5 with channels
(64, 64, 64, 128, 256, 512); decoder = 5 unpack stages with skip concat (A)
or add (B) + iconv + 4 InvDepth heads.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from packnet_sfm_tpu.nn.layers import Conv2dBlock, InvDepthHead, ResidualBlock, _conv_init
from packnet_sfm_tpu.ops.fold_conv import channel_conv3d, fused_pack_conv
from packnet_sfm_tpu.ops.packing import depth_to_space, space_to_depth
from packnet_sfm_tpu.ops.image import interpolate_image

import jax


class ChannelConv3d(nn.Module):
    """3x3x3 conv over (channel-as-depth, H, W), emitting the folded layout.

    Computes the reference's ``Conv3d(1, d, 3)`` over [B, 1, C, H, W] followed
    by the channel fold view(b, d*C, h, w) (layers01.py:236-245) — but never
    materializes a tensor whose minor dimension is ``d``: on TPU a
    [..., d=8] minor dim is lane-padded 8->128, a measured 16x memory
    expansion (15 GB for a 960 MB intermediate) that starved HBM and
    serialized the whole train step. The math lives in
    ops/fold_conv.channel_conv3d (27 shifted FMAs into the folded layout).

    Param names/shapes match flax nn.Conv ('kernel' [3,3,3,1,d], 'bias' [d])
    so utils/torch_import mappings are unchanged.
    """

    d: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", _conv_init, (3, 3, 3, 1, self.d))
        bias = self.param("bias", nn.initializers.zeros, (self.d,))
        return channel_conv3d(x, kernel, bias, self.dtype or x.dtype)


class _Conv2dParams(nn.Module):
    """Declares nn.Conv-compatible params without running nn.Conv, so a fused
    kernel can consume them while keeping the checkpoint tree identical."""

    features: int
    kernel_size: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        kernel = self.param("kernel", _conv_init,
                            (k, k, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _FusedPackConvBlock(nn.Module):
    """Fused conv3d∘fold∘conv2d (+ GroupNorm + ELU), param tree identical to
    Conv2dBlock so it scopes as 'Conv2dBlock_0' in checkpoints."""

    features: int
    kernel_size: int
    d: int
    dtype: Optional[jnp.dtype] = None
    mode: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, w3: jnp.ndarray, b3: jnp.ndarray) -> jnp.ndarray:
        cp = x.shape[-1]
        w2, b2 = _Conv2dParams(self.features, self.kernel_size,
                               self.d * cp, name="Conv_0")()
        y = fused_pack_conv(x, w3, b3, w2, b2, self.dtype or x.dtype,
                            mode=self.mode)
        from packnet_sfm_tpu.nn.layers import FastGroupNorm
        y = FastGroupNorm(num_groups=16, epsilon=1e-5, dtype=self.dtype,
                          name="GroupNorm_0")(y)
        return jax.nn.elu(y)


class PackLayerConv3d(nn.Module):
    """Pack: space-to-depth -> 3D conv over packed channels -> 2D conv.

    Parity: layers01.py:213-247. Input [B, H, W, C] -> [B, H/2, W/2, C].

    With ``fuse=True`` (default) the linear conv3d∘fold∘conv2d composition
    collapses into one conv over the unexpanded packed channels
    (ops/fold_conv.fused_pack_conv): exact to dtype rounding, ~2.5-4x fewer
    FLOPs, and the [B, H, W, d*Cp] activation never exists — this was the
    batch-4 HBM-OOM tensor family on v5e. Params are identical either way.
    """

    features: int        # in == out channel count C
    kernel_size: int
    r: int = 2
    d: int = 8           # number of 3D features
    dtype: Optional[jnp.dtype] = None
    fuse: bool = True
    mode: str = "auto"   # fused_pack_conv mode: auto | fused | two_step

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = space_to_depth(x, self.r)                      # [B, H/r, W/r, C*r*r]
        if not self.fuse:
            x = ChannelConv3d(self.d, self.dtype, name="Conv_0")(x)
            return Conv2dBlock(self.features, self.kernel_size, 1, self.dtype,
                               name="Conv2dBlock_0")(x)
        w3 = _Conv3dParams(self.d, name="Conv_0")()
        return _FusedPackConvBlock(self.features, self.kernel_size, self.d,
                                   self.dtype, self.mode,
                                   name="Conv2dBlock_0")(x, *w3)


class _Conv3dParams(nn.Module):
    """Declares ChannelConv3d-compatible params for the fused path."""

    d: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", _conv_init, (3, 3, 3, 1, self.d))
        bias = self.param("bias", nn.initializers.zeros, (self.d,))
        return kernel, bias


class UnpackLayerConv3d(nn.Module):
    """Unpack: 2D conv -> 3D conv -> depth-to-space upsample.

    Parity: layers01.py:250-286. Input [B, H, W, C] -> [B, rH, rW, out].
    """

    features: int        # output channels
    kernel_size: int
    r: int = 2
    d: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = self.features * self.r * self.r // self.d
        x = Conv2dBlock(mid, self.kernel_size, 1, self.dtype)(x)  # [B, H, W, out*r*r/d]
        x = ChannelConv3d(self.d, self.dtype, name="Conv_0")(x)
        return depth_to_space(x, self.r)


class PackNetBase(nn.Module):
    """Shared PackNet01/Slim01 topology; channel plan set by subclass fields.

    version: 'A' (skip concat) or 'B' (skip add), reference PackNet01.py:41-54.
    """

    version: str = "A"
    dropout: Optional[float] = None
    ni: int = 64
    channels: Tuple[int, int, int, int, int] = (64, 64, 128, 256, 512)
    num_blocks: Tuple[int, int, int, int] = (2, 2, 3, 3)
    num_3d_feat: int = 8
    out_channels: int = 1
    dtype: Optional[jnp.dtype] = None
    remat: bool = False
    fuse: bool = True
    # fused_pack_conv mode for every pack layer. The engine sets "two_step"
    # when tracing over a space-partitioned mesh (see engine/train.py).
    pack_mode: str = "auto"

    @nn.compact
    def __call__(self, rgb: jnp.ndarray, *, train: bool = True) -> list:
        # Optional recompute-in-backward. With the fold-conv fusion
        # (fuse=True) the pack layers' big d*Cp intermediates no longer
        # exist, so remat defaults OFF (measured +19% step time for HBM we
        # don't need at 192x640 b4). Enable for HR/large-batch configs.
        # Coverage includes the full-resolution Conv2dBlocks and disp heads:
        # at 384x1280 their ELU/conv temps are the top HBM buffers (362 MB
        # each at b3 — XLA space-to-batches the big convs into a layout
        # whose 64-channel lane dim pads 2x; see docs/STATUS.md round 5).
        Pack = nn.remat(PackLayerConv3d) if self.remat else PackLayerConv3d
        Unpack = nn.remat(UnpackLayerConv3d) if self.remat else UnpackLayerConv3d
        Conv2dBlockR = nn.remat(Conv2dBlock) if self.remat else Conv2dBlock
        InvDepthHeadR = nn.remat(InvDepthHead) if self.remat else InvDepthHead
        v = self.version
        no = self.out_channels
        ni = self.ni
        n1, n2, n3, n4, n5 = self.channels
        d = self.num_3d_feat
        pack_kernel = (5, 3, 3, 3, 3)
        unpack_kernel = (3, 3, 3, 3, 3)
        iconv_kernel = (3, 3, 3, 3, 3)

        if v == "A":  # concat skips
            n1o, n1i = n1, n1 + ni + no
            n2o, n2i = n2, n2 + n1 + no
            n3o, n3i = n3, n3 + n2 + no
            n4o, n4i = n4, n4 + n3
            n5o, n5i = n5, n5 + n4
        elif v == "B":  # add skips
            n1o, n1i = n1, n1 + no
            n2o, n2i = n2, n2 + no
            n3o, n3i = n3 // 2, n3 // 2 + no
            n4o, n4i = n4 // 2, n4 // 2
            n5o, n5i = n5 // 2, n5 // 2
        else:
            raise ValueError(f"Unknown PackNet version {v}")

        x = Conv2dBlockR(ni, 5, 1, self.dtype, name="pre_calc")(rgb)

        # Encoder: conv_i -> pack_i
        x1 = Conv2dBlockR(n1, 7, 1, self.dtype, name="conv1")(x)
        x1p = Pack(n1, pack_kernel[0], d=d, dtype=self.dtype, fuse=self.fuse, mode=self.pack_mode, name="pack1")(x1)
        x2 = ResidualBlock(n2, self.num_blocks[0], 1, self.dropout, self.dtype, name="conv2")(x1p, train=train)
        x2p = Pack(n2, pack_kernel[1], d=d, dtype=self.dtype, fuse=self.fuse, mode=self.pack_mode, name="pack2")(x2)
        x3 = ResidualBlock(n3, self.num_blocks[1], 1, self.dropout, self.dtype, name="conv3")(x2p, train=train)
        x3p = Pack(n3, pack_kernel[2], d=d, dtype=self.dtype, fuse=self.fuse, mode=self.pack_mode, name="pack3")(x3)
        x4 = ResidualBlock(n4, self.num_blocks[2], 1, self.dropout, self.dtype, name="conv4")(x3p, train=train)
        x4p = Pack(n4, pack_kernel[3], d=d, dtype=self.dtype, fuse=self.fuse, mode=self.pack_mode, name="pack4")(x4)
        x5 = ResidualBlock(n5, self.num_blocks[3], 1, self.dropout, self.dtype, name="conv5")(x4p, train=train)
        x5p = Pack(n5, pack_kernel[4], d=d, dtype=self.dtype, fuse=self.fuse, mode=self.pack_mode, name="pack5")(x5)

        skip1, skip2, skip3, skip4, skip5 = x, x1p, x2p, x3p, x4p

        def merge(up, skip):
            return jnp.concatenate([up, skip], axis=-1) if v == "A" else up + skip

        # Decoder
        unpack5 = Unpack(n5o, unpack_kernel[0], d=d, dtype=self.dtype, name="unpack5")(x5p)
        iconv5 = Conv2dBlockR(n5, iconv_kernel[0], 1, self.dtype, name="iconv5")(merge(unpack5, skip5))

        unpack4 = Unpack(n4o, unpack_kernel[1], d=d, dtype=self.dtype, name="unpack4")(iconv5)
        iconv4 = Conv2dBlockR(n4, iconv_kernel[1], 1, self.dtype, name="iconv4")(merge(unpack4, skip4))
        disp4 = InvDepthHeadR(no, dtype=self.dtype, name="disp4")(iconv4)
        udisp4 = interpolate_image(disp4, (disp4.shape[1] * 2, disp4.shape[2] * 2), mode="nearest")

        unpack3 = Unpack(n3o, unpack_kernel[2], d=d, dtype=self.dtype, name="unpack3")(iconv4)
        concat3 = jnp.concatenate([merge(unpack3, skip3), udisp4], axis=-1) if v == "B" else \
            jnp.concatenate([unpack3, skip3, udisp4], axis=-1)
        iconv3 = Conv2dBlockR(n3, iconv_kernel[2], 1, self.dtype, name="iconv3")(concat3)
        disp3 = InvDepthHeadR(no, dtype=self.dtype, name="disp3")(iconv3)
        udisp3 = interpolate_image(disp3, (disp3.shape[1] * 2, disp3.shape[2] * 2), mode="nearest")

        unpack2 = Unpack(n2o, unpack_kernel[3], d=d, dtype=self.dtype, name="unpack2")(iconv3)
        concat2 = jnp.concatenate([merge(unpack2, skip2), udisp3], axis=-1) if v == "B" else \
            jnp.concatenate([unpack2, skip2, udisp3], axis=-1)
        iconv2 = Conv2dBlockR(n2, iconv_kernel[3], 1, self.dtype, name="iconv2")(concat2)
        disp2 = InvDepthHeadR(no, dtype=self.dtype, name="disp2")(iconv2)
        udisp2 = interpolate_image(disp2, (disp2.shape[1] * 2, disp2.shape[2] * 2), mode="nearest")

        unpack1 = Unpack(n1o, unpack_kernel[4], d=d, dtype=self.dtype, name="unpack1")(iconv2)
        concat1 = jnp.concatenate([merge(unpack1, skip1), udisp2], axis=-1) if v == "B" else \
            jnp.concatenate([unpack1, skip1, udisp2], axis=-1)
        iconv1 = Conv2dBlockR(n1, iconv_kernel[4], 1, self.dtype, name="iconv1")(concat1)
        disp1 = InvDepthHeadR(no, dtype=self.dtype, name="disp1")(iconv1)

        return [disp1, disp2, disp3, disp4]


class PackNet01(PackNetBase):
    """PackNet01 (PackNet01.py:8): ni=64, channels (64,64,128,256,512), d=8."""


class PackNetSlim01(PackNetBase):
    """PackNetSlim01 (PackNetSlim01.py): ni=32, n1=32, d=4."""

    ni: int = 32
    channels: Tuple[int, int, int, int, int] = (32, 64, 128, 256, 512)
    num_3d_feat: int = 4
