"""packnet_sfm_tpu — a TPU-native (JAX/XLA/Pallas) self-supervised SfM framework.

Re-designed from scratch with the capabilities of TRI-ML/packnet-sfm
(reference mounted at /root/reference), built TPU-first:

- NHWC layouts everywhere (XLA-TPU's preferred conv layout).
- Pure-functional differentiable geometry (no stateful Camera/Pose objects).
- flax.linen networks, optax optimizers, orbax checkpoints.
- Data parallelism via jax.sharding.Mesh + NamedSharding (ICI/DCN collectives
  inserted by XLA), replacing the reference's Horovod/NCCL stack.
- Pallas kernels for hot ops (packing convs, warp sampling).
"""

__version__ = "0.1.0"
