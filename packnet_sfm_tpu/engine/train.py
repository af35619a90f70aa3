"""Jitted train/eval steps over a device mesh.

The TPU-native core of the runtime (replaces reference trainers/
horovod_trainer.py:73-155's per-batch loop): one jit-compiled function per
(shape, scale-count) doing forward + backward + optimizer update, with the
batch sharded over the ``data`` mesh axis and parameters replicated. XLA
inserts the gradient psum over ICI — no explicit allreduce anywhere.

Host-dispatch discipline (matters hugely on remote/tunneled backends where
every eager op or transfer is a roundtrip):
- the per-step RNG is derived inside the graph via fold_in(state.rng,
  state.step) — no per-step PRNGKey dispatch;
- metrics are accumulated into a donated device-side accumulator and fetched
  once per epoch, not per step.

bf16 policy: pass compute dtype to the networks (flax casts per-op; params
and optimizer state stay f32) and cast batch images on device.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from packnet_sfm_tpu.engine.metrics import (
    DepthMetricsConfig,
    compute_depth_metrics_per_sample,
    post_process_inv_depth,
)
from packnet_sfm_tpu.models.sfm import SfmModelDef, model_forward, model_loss
from packnet_sfm_tpu.ops.fold_conv import force_mode as fold_conv_force_mode
from packnet_sfm_tpu.parallel.mesh import batch_sharding, replicate_sharding

METRIC_KEYS = ("loss", "photometric_loss", "smoothness_loss",
               "supervised_loss", "supervised_loss_rgbd", "depth_loss",
               "velocity_loss")


class TrainState(struct.PyTreeNode):
    """Replicated training state (params + stats + optimizer + step + rng)."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    rng: jnp.ndarray

    @classmethod
    def create(cls, variables: Dict, tx: optax.GradientTransformation,
               rng: Optional[jax.Array] = None):
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=rng if rng is not None else jax.random.PRNGKey(0),
        )

    def variables(self) -> Dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def zero_metrics() -> Dict[str, jnp.ndarray]:
    """Device-side metric accumulator: {key: [sum, count]}."""
    return {k: jnp.zeros((2,), jnp.float32) for k in METRIC_KEYS}


def _cast_tree(tree, dtype):
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree)


def make_train_step(
    model: SfmModelDef,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    num_scales: Optional[int] = None,
    compute_dtype: jnp.dtype = jnp.float32,
    grad_accum: int = 1,
):
    """Build the jitted, mesh-sharded train step.

    Returns step(state, metric_acc, batch, progress) -> (state, metric_acc).
    Batch leaves are sharded on their leading axis; state/acc are replicated
    and donated. Fetch metrics via ``metric_acc`` at epoch end.

    grad_accum > 1 splits the batch into microbatches scanned inside the
    step (gradients averaged, one optimizer update) — large effective batch
    at microbatch activation memory; PackNet's fold-conv backward temps are
    the HBM ceiling at full 192x640 (docs/DESIGN.md).
    """

    def loss_fn(params, state: TrainState, batch, rng, progress):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        if compute_dtype != jnp.float32:
            batch = _cast_tree(batch, compute_dtype)
        loss, (metrics, _out, updates) = model_loss(
            model, variables, batch, rng, num_scales=num_scales,
            progress=progress)
        return loss.astype(jnp.float32), (metrics, updates)

    def _grads_and_metrics(state, batch, rng, progress):
        if grad_accum <= 1:
            (_, (metrics, updates)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state, batch, rng, progress)
            return grads, metrics, updates

        def micro(batch_leaf):
            # [G*m, ...] -> [G, m, ...]
            return batch_leaf.reshape(
                (grad_accum, batch_leaf.shape[0] // grad_accum)
                + batch_leaf.shape[1:])

        micro_batches = jax.tree_util.tree_map(micro, batch)

        def body(carry, xs):
            grads_sum, metrics_sum = carry
            mb, i = xs
            (_, (metrics, _upd)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(
                    state.params, state, mb,
                    jax.random.fold_in(rng, i), progress)
            grads_sum = jax.tree_util.tree_map(jnp.add, grads_sum, grads)
            # fixed carry structure: always all METRIC_KEYS
            metrics_sum = {
                k: metrics_sum[k] + metrics.get(k, jnp.zeros((), jnp.float32))
                for k in METRIC_KEYS}
            return (grads_sum, metrics_sum), None

        zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        zero_m = {k: jnp.zeros((), jnp.float32) for k in METRIC_KEYS}
        (grads, metrics), _ = jax.lax.scan(
            body, (zero_g, zero_m),
            (micro_batches, jnp.arange(grad_accum)))
        inv = 1.0 / grad_accum
        grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
        metrics = {k: v * inv for k, v in metrics.items()}
        return grads, metrics, {}

    def step(state: TrainState, acc, batch, progress):
        rng = jax.random.fold_in(state.rng, state.step)
        grads, metrics, updates = _grads_and_metrics(state, batch, rng, progress)
        grad_updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, grad_updates)
        new_stats = updates.get("batch_stats", state.batch_stats)
        new_state = state.replace(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        new_acc = dict(acc)
        for k in METRIC_KEYS:
            if k in metrics:
                new_acc[k] = acc[k] + jnp.stack(
                    [metrics[k].astype(jnp.float32), jnp.float32(1.0)])
        return new_state, new_acc

    # Sharding is placement-driven: the batch arrives device_put with a
    # NamedSharding over the 'data' axis (parallel.mesh.shard_batch) and the
    # state is replicated at creation (replicate_state). jit infers the SPMD
    # partitioning from committed operand shardings. We deliberately avoid
    # in_shardings/out_shardings: on the axon-tunneled backend that code path
    # executed ~65x slower than the committed-operand path (214ms vs 14s per
    # step, measured) with identical semantics.
    space_sharded = dict(getattr(mesh, "shape", {})).get("space", 1) > 1
    del mesh
    jitted = jax.jit(step, donate_argnums=(0, 1))

    def call(state, acc, batch, progress=0.0):
        # Under a space-partitioned mesh, trace the pack layers through the
        # two-step path — the fused border corrections straddle the 'space'
        # shard boundary and explode SPMD compile time (fold_conv.force_mode).
        with fold_conv_force_mode("two_step" if space_sharded else None):
            return jitted(state, acc, batch, jnp.float32(progress))

    return call


def replicate_state(state, mesh: Mesh):
    """Commit the train state replicated over the mesh (multi-chip DP)."""
    if mesh.devices.size <= 1:
        return state
    return jax.device_put(state, replicate_sharding(mesh))


def make_eval_step(
    model: SfmModelDef,
    mesh: Mesh,
    metrics_cfg: DepthMetricsConfig,
    compute_dtype: jnp.dtype = jnp.float32,
):
    """Build the jitted eval step: two depth forwards (straight + flipped),
    flip post-processing, and the 4 metric modes.

    Parity: reference model_wrapper.py:291-317 (``evaluate_depth``) +
    model_utils.py:97-127 (``flip_batch_input`` flips input_depth too, so
    PackNetSAN's rgb+lidar completion eval works). Returns
    step(state, batch) -> {mode: [B, 7] per-sample metrics}, with modes
    '', '_pp', '_gt', '_pp_gt'. Per-sample rows (not batch means) so the
    caller can mask pad rows and scatter by dataset index for the
    cross-process reduction (reference utils/reduce.py:31-80).
    """
    from packnet_sfm_tpu.ops.image import flip_lr

    def step(state: TrainState, batch):
        variables = state.variables()
        # One batched forward for [straight; flipped] instead of two: the
        # flip-TTA pass rides the same kernels at 2x occupancy, which is
        # nearly free on TPU where small-batch conv steps are launch/
        # bandwidth-bound (reference runs two forwards, model_wrapper.py:299).
        # Every image-like model input is flipped for the second half
        # (input_depth for completion models — model_utils.py:113-116).
        inputs = {}
        for key in model.input_keys:
            if key == "intrinsics" or key not in batch:
                continue
            inputs[key] = jnp.concatenate(
                [batch[key], flip_lr(batch[key])], axis=0)
        out2, _ = model_forward(model, variables, inputs, train=False)
        b = batch["rgb"].shape[0]
        inv2 = out2["inv_depths"][0].astype(jnp.float32)
        inv_depth = inv2[:b]
        inv_depth_pp = post_process_inv_depth(inv_depth, inv2[b:])

        depth = 1.0 / jnp.clip(inv_depth, min=1e-6)
        depth_pp = 1.0 / jnp.clip(inv_depth_pp, min=1e-6)
        gt = batch["depth"]
        pm = compute_depth_metrics_per_sample
        return {
            "depth": pm(gt, depth, metrics_cfg, use_gt_scale=False),
            "depth_pp": pm(gt, depth_pp, metrics_cfg, use_gt_scale=False),
            "depth_gt": pm(gt, depth, metrics_cfg, use_gt_scale=True),
            "depth_pp_gt": pm(gt, depth_pp, metrics_cfg, use_gt_scale=True),
            "inv_depth": inv_depth_pp,
        }

    space_sharded = dict(getattr(mesh, "shape", {})).get("space", 1) > 1
    del mesh  # placement-driven sharding; see make_train_step
    jitted = jax.jit(step)

    def call(*args, **kwargs):
        with fold_conv_force_mode("two_step" if space_sharded else None):
            return jitted(*args, **kwargs)

    return call
