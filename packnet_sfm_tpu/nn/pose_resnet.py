"""PoseResNet: 2-frame ResNet encoder + monodepth2 pose decoder.

Parity: reference networks/pose/PoseResNet.py: for each context frame,
encode concat(target, ref) and decode a 6-DoF vector; output
[B, n_context, 6] ordered [translation | axisangle] to match
``pose_vec_to_mat``'s [t | r] convention.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from packnet_sfm_tpu.nn.resnet import PoseDecoder, ResNetEncoder


class PoseResNet(nn.Module):
    version: str = "18"

    @nn.compact
    def __call__(self, image: jnp.ndarray, context: list, *, train: bool = True) -> jnp.ndarray:
        num_layers = int(self.version[:2])
        encoder = ResNetEncoder(num_layers=num_layers, num_input_images=2,
                                name="encoder")
        decoder = PoseDecoder(num_frames_to_predict_for=2, name="decoder")
        outs = []
        for ref in context:
            feats = encoder(jnp.concatenate([image, ref], axis=-1), train=train)
            axisangle, translation = decoder(feats[-1])
            outs.append(jnp.concatenate([translation[:, 0], axisangle[:, 0]], axis=-1))
        return jnp.concatenate(outs, axis=1).reshape(image.shape[0], len(context), 6)
