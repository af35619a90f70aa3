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


def make_mesh_2d(spatial_shards: int, num_devices: Optional[int] = None,
                 devices=None) -> Mesh:
    """2-axis ``(data, space)`` mesh: batch DP x spatial partitioning.

    ``space`` shards the image height of every [B, H, W, C] tensor; XLA's
    SPMD partitioner inserts the conv halo exchanges over ICI. Use for
    HR configs (e.g. 384x1280) where per-chip activations, not batch,
    are the limit — capability the reference (DP-only Horovod, SURVEY
    §2.10) does not have.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None and num_devices > 0:
        devices = devices[:num_devices]
    n = len(devices)
    if n % spatial_shards:
        raise ValueError(f"{n} devices not divisible by {spatial_shards}")
    return Mesh(np.asarray(devices).reshape(n // spatial_shards, spatial_shards),
                ("data", "space"))


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
    if "space" in mesh.shape and mesh.shape["space"] > 1:
        img_sh = NamedSharding(mesh, P("data", "space"))

        def put(x):
            x = np.asarray(x)
            # [B, H, W, C] images / depth maps: shard H over 'space' too.
            if x.ndim == 4 and x.shape[1] % mesh.shape["space"] == 0:
                return jax.device_put(x, img_sh)
            return jax.device_put(x, sh)
        return jax.tree_util.tree_map(put, batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
