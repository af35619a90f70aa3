"""SfM model family: functional composition of depth/pose nets + losses.

Capability parity with the reference model zoo (models/SfmModel.py,
SelfSupModel.py, SemiSupModel.py, VelSupModel.py, SemiSupCompletionModel.py),
re-designed functionally: a model is a static ``SfmModelDef`` (which networks
+ which loss mix) plus pure functions ``model_forward`` / ``model_loss`` that
take flax variables and a batch pytree. Everything jits and shards.

The reference's random lr-flip TTA during training (SfmModel.py:81-89,
``flip_lr_prob``) is preserved, expressed as a traced bernoulli + select so
shapes stay static under jit.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from packnet_sfm_tpu.geometry.pose import pose_vec_to_mat
from packnet_sfm_tpu.losses.photometric import (
    MultiViewPhotometricConfig,
    multiview_photometric_loss,
)
from packnet_sfm_tpu.losses.supervised import SupervisedLossConfig, supervised_loss
from packnet_sfm_tpu.losses.velocity import velocity_loss
from packnet_sfm_tpu.ops.image import flip_lr, interpolate_image

SELF_SUP_KINDS = ("SelfSupModel", "SemiSupModel", "VelSupModel",
                  "SemiSupCompletionModel")
SUPERVISED_KINDS = ("SemiSupModel", "SemiSupCompletionModel")
GENERIC_KINDS = ("GenericSfmModel", "GenericSelfSupModel")


@dataclasses.dataclass(frozen=True)
class SfmModelDef:
    """Static model definition (networks are flax modules; hashable config).

    kind:
      'SfmModel'               — inference only (no loss)
      'SelfSupModel'           — photometric loss (reference SelfSupModel.py)
      'SemiSupModel'           — (1-w)*selfsup + w*supervised (SemiSupModel.py)
      'SemiSupCompletionModel' — SemiSup + rgbd branch + consistency loss
                                 (SemiSupCompletionModel.py:75-123)
      'VelSupModel'            — selfsup + w_vel*velocity (VelSupModel.py)
    """

    depth_net: Any
    pose_net: Optional[Any]
    kind: str = "SelfSupModel"
    photometric: MultiViewPhotometricConfig = MultiViewPhotometricConfig()
    generic_photometric: Any = None      # GenericPhotometricConfig for NRS kinds
    supervised: SupervisedLossConfig = SupervisedLossConfig()
    supervised_loss_weight: float = 0.9
    velocity_loss_weight: float = 0.1
    weight_rgbd: float = 1.0
    rotation_mode: str = "euler"
    flip_lr_prob: float = 0.5
    upsample_depth_maps: bool = False
    input_keys: tuple = ("rgb",)


def init_model(model: SfmModelDef, rng: jax.Array, batch: Dict) -> Dict:
    """Initialize all network variables from a sample batch.

    Replaces the reference's seed-42 implicit weight sync
    (horovod_trainer.py:32-71 quirk, SURVEY §7.4): every process derives
    params from the same explicit key, so replicas agree by construction.
    """
    k_depth, k_pose = jax.random.split(rng)
    variables: Dict = {}

    def img(x):
        # device-jitter loaders ship uint8; init at the model contract dtype
        return x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x

    rgb = img(batch["rgb"])
    extra = {k: batch[k] for k in model.input_keys
             if k not in ("rgb", "intrinsics") and k in batch}
    # jit the inits: un-jitted flax init executes op-by-op, which is very
    # slow on remote/tunneled backends (one dispatch per op).
    dv = jax.jit(partial(model.depth_net.init, train=True))(
        k_depth, rgb, **extra)
    for coll, tree in dv.items():
        variables.setdefault(coll, {})["depth_net"] = tree
    if model.pose_net is not None and "rgb_context" in batch:
        pv = jax.jit(partial(model.pose_net.init, train=True))(
            k_pose, rgb, [img(c) for c in batch["rgb_context"]])
        for coll, tree in pv.items():
            variables.setdefault(coll, {})["pose_net"] = tree
    return variables


def _apply_net(net, variables, *args, train: bool, rngs=None, **kwargs):
    """Apply a flax module, handling mutable batch_stats when training."""
    has_stats = "batch_stats" in variables
    if train and has_stats:
        out, updates = net.apply(variables, *args, train=train, rngs=rngs,
                                 mutable=["batch_stats"], **kwargs)
        return out, updates
    return net.apply(variables, *args, train=train, rngs=rngs, **kwargs), {}


def _normalize_depth_output(out) -> Dict:
    """Depth nets return either a scale list or a dict (PackNetSAN)."""
    if isinstance(out, dict):
        return dict(out)
    if not isinstance(out, (list, tuple)):
        out = [out]
    return {"inv_depths": list(out)}


def _flip_depth_output(out: Dict, do_flip) -> Dict:
    flipped = dict(out)
    for key in ("inv_depths", "inv_depths_rgbd"):
        if key in flipped:
            flipped[key] = [jnp.where(do_flip, flip_lr(d), d)
                            for d in flipped[key]]
    return flipped


def _depth_with_flip(model: SfmModelDef, variables, batch: Dict, rng, train: bool):
    """Depth forward with random lr-flip TTA (SfmModel.py:53-89).

    Runs the net once on a selected (maybe-flipped) input and un-flips the
    outputs with the same predicate — two cheap selects instead of a cond.
    The flip mirrors every image-like input key (reference flip_batch_input,
    model_utils.py:97-124).
    """
    inputs = {k: batch[k] for k in model.input_keys
              if k != "intrinsics" and k in batch}
    args = [inputs.pop("rgb")]
    if train and model.flip_lr_prob > 0.0 and rng is not None:
        do_flip = jax.random.bernoulli(rng, model.flip_lr_prob)
        args = [jnp.where(do_flip, flip_lr(args[0]), args[0])]
        kwargs = {k: jnp.where(do_flip, flip_lr(v), v) for k, v in inputs.items()}
        raw, updates = _apply_net(
            model.depth_net, variables, *args, train=train, **kwargs)
        out = _flip_depth_output(_normalize_depth_output(raw), do_flip)
    else:
        raw, updates = _apply_net(
            model.depth_net, variables, *args, train=train, **inputs)
        out = _normalize_depth_output(raw)
    if train and model.upsample_depth_maps:
        full = out["inv_depths"][0].shape[1:3]
        out["inv_depths"] = [interpolate_image(d, full, mode="nearest")
                             for d in out["inv_depths"]]
    return out, updates


def model_forward(
    model: SfmModelDef,
    variables: Dict,
    batch: Dict,
    rng: Optional[jax.Array] = None,
    train: bool = True,
) -> tuple[Dict, Dict]:
    """Run depth (+ pose) networks on a batch.

    batch keys (NHWC): 'rgb' [B,H,W,3]; optional 'rgb_context' list;
    'intrinsics' [B,3,3]. Returns (output, variable_updates) where output has
    'inv_depths' (list, finest first) and 'poses' (list of [B,4,4]).
    Parity: reference SfmModel.forward:98-127.
    """
    depth_vars = {k: v["depth_net"] for k, v in variables.items() if "depth_net" in v}
    depth_out, depth_updates = _depth_with_flip(
        model, depth_vars, batch, rng, train)
    out: Dict = {**depth_out, "poses": None}
    updates: Dict = {}
    for coll, upd in depth_updates.items():
        updates.setdefault(coll, {})["depth_net"] = upd

    if "rgb_context" in batch and model.pose_net is not None:
        pose_vars = {k: v["pose_net"] for k, v in variables.items() if "pose_net" in v}
        pose_vec, pose_updates = _apply_net(
            model.pose_net, pose_vars, batch["rgb"], batch["rgb_context"], train=train)
        out["poses"] = [
            pose_vec_to_mat(pose_vec[:, i], model.rotation_mode)
            for i in range(pose_vec.shape[1])
        ]
        for coll, upd in pose_updates.items():
            updates.setdefault(coll, {})["pose_net"] = upd
    return out, updates


def depth2inv(depth: jnp.ndarray) -> jnp.ndarray:
    """Depth -> inverse depth, keeping 0 as invalid (reference utils/depth.py:123)."""
    inv = 1.0 / jnp.clip(depth, min=1e-6)
    return jnp.where(depth <= 0.0, 0.0, inv)


def model_loss(
    model: SfmModelDef,
    variables: Dict,
    batch: Dict,
    rng: Optional[jax.Array] = None,
    num_scales: Optional[int] = None,
    progress=0.0,
) -> tuple[jnp.ndarray, tuple[Dict, Dict, Dict]]:
    """Training loss for the model's kind.

    ``num_scales`` (static) overrides the photometric scale count — the
    trainer resolves the progressive schedule host-side. ``progress`` may be
    a traced scalar (used smoothly by the generic/NRS loss annealing).
    Returns (loss, (metrics, output, variable_updates)).
    """
    out, updates = model_forward(model, variables, batch, rng, train=True)
    metrics: Dict = {}
    loss = jnp.zeros(())

    photo_cfg = model.photometric
    if num_scales is not None and num_scales != photo_cfg.num_scales:
        photo_cfg = dataclasses.replace(photo_cfg, num_scales=num_scales)

    if model.kind == "GenericSelfSupModel":
        from packnet_sfm_tpu.geometry.camera_generic import canonical_pinhole_rays
        from packnet_sfm_tpu.losses.generic_photometric import (
            GenericPhotometricConfig, generic_multiview_photometric_loss)
        gcfg = model.generic_photometric or GenericPhotometricConfig()
        h, w = batch["rgb"].shape[1:3]
        canonical = canonical_pinhole_rays(h, w)
        temperature = jnp.maximum(1e-8, 1e-4 / jnp.exp(0.1 * progress))
        g_loss, g_metrics = generic_multiview_photometric_loss(
            batch.get("rgb_original", batch["rgb"]),
            batch.get("rgb_context_original", batch.get("rgb_context")),
            out["inv_depths"],
            out["ray_surface"],
            canonical,
            out["poses"],
            gcfg,
            progress,
            temperature,
        )
        metrics.update(g_metrics)
        metrics["loss"] = g_loss
        return g_loss, (metrics, out, updates)

    if model.kind in SELF_SUP_KINDS:
        sup_w = model.supervised_loss_weight if model.kind in SUPERVISED_KINDS else 0.0
        if sup_w < 1.0:
            self_loss, self_metrics = multiview_photometric_loss(
                batch.get("rgb_original", batch["rgb"]),
                batch.get("rgb_context_original", batch.get("rgb_context")),
                out["inv_depths"],
                batch["intrinsics"],
                out["poses"],
                photo_cfg,
            )
            metrics.update(self_metrics)
            loss = loss + (1.0 - sup_w) * self_loss if model.kind in SUPERVISED_KINDS \
                else loss + self_loss

    if model.kind in SUPERVISED_KINDS:
        gt_inv = depth2inv(batch["depth"])
        sup_loss, sup_metrics = supervised_loss(
            out["inv_depths"], gt_inv, model.supervised)
        metrics.update(sup_metrics)
        loss = loss + model.supervised_loss_weight * sup_loss
        if "inv_depths_rgbd" in out:
            # rgbd-branch supervision + skip-feature consistency
            # (reference SemiSupCompletionModel.py:109-117)
            sup_rgbd, _ = supervised_loss(out["inv_depths_rgbd"], gt_inv,
                                          model.supervised)
            metrics["supervised_loss_rgbd"] = sup_rgbd
            loss = loss + model.weight_rgbd * model.supervised_loss_weight * sup_rgbd
            if "depth_loss" in out:
                metrics["depth_loss"] = out["depth_loss"]
                loss = loss + out["depth_loss"]

    if model.kind == "VelSupModel":
        vel_loss, vel_metrics = velocity_loss(out["poses"], batch["pose_context"])
        metrics.update(vel_metrics)
        loss = loss + model.velocity_loss_weight * vel_loss

    metrics["loss"] = loss
    return loss, (metrics, out, updates)
