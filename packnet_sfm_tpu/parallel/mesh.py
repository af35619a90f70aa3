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


def all_reduce_host_sum(tree):
    """Sum host-local numpy arrays across all processes.

    The TPU-native stand-in for the reference's ``hvd.allreduce(average=False)``
    (utils/reduce.py:31-80, utils/horovod.py:30-48): each host contributes its
    local per-sample metric/seen-count arrays; every host gets the global sum.
    Single-process (tests, single host) is the identity.
    """
    if jax.process_count() <= 1:
        return tree
    from jax.experimental import multihost_utils

    def red(x):
        gathered = multihost_utils.process_allgather(np.asarray(x))
        return np.asarray(gathered).sum(axis=0)

    return jax.tree_util.tree_map(red, tree)


def any_process_flag(flag: bool) -> bool:
    """True iff ``flag`` is set on ANY process (single-process: identity).

    Used to agree on preemption across processes: a SIGTERM lands on ONE
    process, but every process must leave the train loop at the SAME batch
    boundary or the next collective deadlocks (the survivors wait on a step
    the preempted process never joins). All processes must call this at the
    same point.
    """
    if jax.process_count() <= 1:
        return flag
    from jax.experimental import multihost_utils

    total = multihost_utils.process_allgather(
        np.asarray([1.0 if flag else 0.0], np.float32))
    return bool(np.asarray(total).sum() > 0)


def shard_batch(batch, mesh: Mesh):
    """Commit every batch leaf sharded on its leading (batch) axis.

    Replaces DataLoader+DistributedSampler device placement
    (reference model_wrapper.py:569-599 + base_trainer.py:8-18).

    Multi-host: each process holds only its own loader shard, so the global
    array is assembled with ``jax.make_array_from_process_local_data`` —
    the local numpy is this host's slice of the global batch (global batch
    size = local x process_count). Single-process is a plain device_put.
    """
    multiproc = jax.process_count() > 1

    def commit(x, sharding):
        x = np.asarray(x)
        if multiproc:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    sh = batch_sharding(mesh)
    if "space" in mesh.shape and mesh.shape["space"] > 1:
        img_sh = NamedSharding(mesh, P("data", "space"))

        def put(x):
            x = np.asarray(x)
            # [B, H, W, C] images / depth maps: shard H over 'space' too.
            if x.ndim == 4 and x.shape[1] % mesh.shape["space"] == 0:
                return commit(x, img_sh)
            return commit(x, sh)
        return jax.tree_util.tree_map(put, batch)
    return jax.tree_util.tree_map(lambda x: commit(x, sh), batch)


def host_local_rows(x) -> np.ndarray:
    """This process's rows of a batch-sharded array, in local batch order.

    Multi-host eval outputs are globally sharded; ``np.asarray`` would fail
    (non-addressable shards). The host's addressable shards, sorted by their
    global offset, reconstruct exactly the rows that came from this host's
    loader shard — which is what the per-sample metric scatter needs.
    """
    if jax.process_count() <= 1 or isinstance(x, np.ndarray):
        return np.asarray(x)
    shards = x.addressable_shards
    # Arrays on a 2D (data x space) mesh have several shards per batch row
    # block (e.g. inv_depth [B,H,W,1] with H on 'space'): reassemble the
    # non-leading axes inside each axis-0 block instead of blindly
    # concatenating on axis 0 (which would duplicate/mangle rows).
    starts = sorted({s.index[0].start or 0 for s in shards})
    row_of = {st: i for i, st in enumerate(starts)}
    blocks: list = [None] * len(starts)
    for s in shards:
        st = s.index[0].start or 0
        data = np.asarray(s.data)
        if blocks[row_of[st]] is None:
            shape = (data.shape[0],) + tuple(x.shape[1:])
            blocks[row_of[st]] = np.empty(shape, data.dtype)
        dest = tuple(slice(ix.start, ix.stop) for ix in s.index[1:])
        blocks[row_of[st]][(slice(None),) + dest] = data
    return np.concatenate(blocks, axis=0)
