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
from packnet_sfm_tpu.parallel.mesh import batch_sharding, replicate_sharding

METRIC_KEYS = ("loss", "photometric_loss", "smoothness_loss",
               "supervised_loss", "supervised_loss_rgbd", "depth_loss",
               "velocity_loss")


def _resolve_pack_mode(model: SfmModelDef, mesh: Mesh) -> SfmModelDef:
    """Pick the pack layers' fold-conv mode for this mesh, statically.

    Under a space-partitioned (2D data x space) mesh the fused path's border
    corrections are .at[:, :m]/.at[:, -m:] updates that straddle the 'space'
    shard boundary; the SPMD partitioner turns each into cross-shard
    dynamic-update-slice + collective pairs, and 21 pack/unpack layers of
    that blew the multichip dryrun's compile budget (MULTICHIP_r02 rc=124).
    The two-step path is plain halo-exchanged convs, which partition cheaply.

    Memory tradeoff: two_step re-materializes the [B, H, W, d*Cp] folded
    activations — the tensor family whose conv-backward temps OOMed batch 4
    at 192x640 on a single v5e chip. Under a space mesh each shard holds
    only 1/space of every spatial tensor, which is what buys the headroom
    back; docs/bench_hr_2dmesh.py validates the full-HR (384x1280) train
    step on the 8-device 2D mesh, and HR configs should keep remat on.

    The mode is threaded statically into the module tree (clone) rather
    than via any trace-time global, so direct tracing of the jitted step
    (e.g. docs/bench_cost_probe.py lowering `jitted` from the closure) and
    concurrent train/eval tracing both see the right mode.
    """
    if dict(getattr(mesh, "shape", {})).get("space", 1) <= 1:
        return model
    if not hasattr(model.depth_net, "pack_mode"):
        return model
    return dataclasses.replace(
        model, depth_net=model.depth_net.clone(pack_mode="two_step"))


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


def prepare_train_batch(batch: Dict) -> Dict:
    """In-graph half of the input pipeline: uint8 decode + device jitter.

    When the loader runs in device_jitter mode (the default —
    datasets/augmentations.train_transform), batches arrive with UINT8
    images (8x less host->device traffic than f32 + pre-duplicated
    originals) and a per-sample factor array batch['jitter'] [B, 4]. This
    casts to f32 [0, 1], duplicates the originals (free: pure aliasing
    under XLA), and applies the jitter in-graph (ops/jitter.apply_jitter)
    where it fuses into the input casts. Float sources (e.g. the synthetic
    dataset) may also carry 'jitter' — then only the cast is skipped. Host-
    jitter batches (no uint8, no 'jitter' key) pass through untouched.
    """
    is_u8 = batch["rgb"].dtype == jnp.uint8
    if not is_u8 and "jitter" not in batch:
        return batch
    batch = dict(batch)
    inv = jnp.float32(1.0 / 255.0)

    def to_f(x):
        return x.astype(jnp.float32) * inv if is_u8 else x.astype(jnp.float32)

    rgb = to_f(batch["rgb"])
    ctx = [to_f(c) for c in batch.get("rgb_context", [])]
    params = batch.pop("jitter", None)
    if params is not None:
        from packnet_sfm_tpu.ops.jitter import apply_jitter
        batch["rgb"] = apply_jitter(rgb, params)
        batch["rgb_original"] = rgb
        if ctx:
            batch["rgb_context"] = [apply_jitter(c, params) for c in ctx]
            batch["rgb_context_original"] = ctx
    else:
        batch["rgb"] = rgb
        batch["rgb_original"] = rgb
        if ctx:
            batch["rgb_context"] = ctx
            batch["rgb_context_original"] = ctx
    return batch


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
    model = _resolve_pack_mode(model, mesh)

    def loss_fn(params, state: TrainState, batch, rng, progress):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        batch = prepare_train_batch(batch)
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
    del mesh
    jitted = jax.jit(step, donate_argnums=(0, 1))

    def call(state, acc, batch, progress=0.0):
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

    model = _resolve_pack_mode(model, mesh)

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

    del mesh  # placement-driven sharding; see make_train_step
    return jax.jit(step)
