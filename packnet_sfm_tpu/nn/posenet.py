"""SfmLearner-style PoseNet, flax.linen, NHWC.

Parity: reference networks/pose/PoseNet.py: 7 stride-2 conv+GroupNorm(16)+ReLU
stages over concat(target, contexts), 1x1 head, spatial mean,
0.01 * [B, n_ref, 6] output ([tx ty tz rx ry rz] per context frame).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

_conv_init = nn.initializers.xavier_uniform()


class _ConvGN(nn.Module):
    features: int
    kernel_size: int = 3
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        p = (self.kernel_size - 1) // 2
        x = nn.Conv(self.features, (self.kernel_size,) * 2, strides=(2, 2),
                    padding=[(p, p), (p, p)], kernel_init=_conv_init,
                    dtype=self.dtype)(x)
        from packnet_sfm_tpu.nn.layers import FastGroupNorm
        x = FastGroupNorm(num_groups=16, epsilon=1e-5, dtype=self.dtype,
                          name="GroupNorm_0")(x)
        return jax.nn.relu(x)


class PoseNet(nn.Module):
    nb_ref_imgs: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, image: jnp.ndarray, context: list, *, train: bool = True) -> jnp.ndarray:
        assert len(context) == self.nb_ref_imgs
        x = jnp.concatenate([image] + list(context), axis=-1)
        channels = (16, 32, 64, 128, 256, 256, 256)
        kernels = (7, 5, 3, 3, 3, 3, 3)
        for i, (c, k) in enumerate(zip(channels, kernels)):
            x = _ConvGN(c, k, self.dtype, name=f"conv{i + 1}")(x)
        x = nn.Conv(6 * self.nb_ref_imgs, (1, 1), kernel_init=_conv_init,
                    dtype=self.dtype, name="pose_pred")(x)
        # pose head mean + scale in f32 (pose values are tiny)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        return 0.01 * x.reshape(x.shape[0], self.nb_ref_imgs, 6)
