"""Device mesh + sharding helpers: the TPU-native replacement for the
reference's Horovod/NCCL data parallelism (SURVEY §2.10, §5.8).

Design: a 1-axis ``data`` mesh over all chips (ICI within a slice, DCN across
hosts). Parameters are replicated; batches are sharded on the leading axis.
Gradient all-reduce is *not* hand-written — jit over sharded inputs makes XLA
insert psum collectives over ICI, the idiomatic equivalent of
``hvd.DistributedOptimizer`` (reference horovod_trainer.py:47-48).

Multi-host: call ``jax.distributed.initialize`` per host before building the
mesh; ``jax.devices()`` then spans the pod slice and the same code scales.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-axis ``data`` mesh over ``num_devices`` chips (default: all)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices).reshape(-1), ("data",))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over the ``data`` axis."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch, mesh: Mesh):
    """Device-put every batch leaf sharded on its leading (batch) axis.

    Replaces DataLoader+DistributedSampler device placement
    (reference model_wrapper.py:569-599 + base_trainer.py:8-18).
    """
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
