"""Config -> model/optimizer factories.

Capability parity with reference models/model_wrapper.py factories
(setup_model:440, setup_depth_net:382, setup_pose_net:411) — class selection
by config name with filtered kwargs (reference utils/load.py:79-105) — and
configure_optimizers (model_wrapper.py:128-153): Adam with separate depth and
pose learning rates + StepLR decay, expressed as optax transforms with
per-subtree labels and a step-indexed schedule.
"""

from __future__ import annotations

from typing import Optional

import optax

from packnet_sfm_tpu.core.config import ConfigNode
from packnet_sfm_tpu.losses.photometric import MultiViewPhotometricConfig
from packnet_sfm_tpu.losses.supervised import SupervisedLossConfig
from packnet_sfm_tpu.models.sfm import SfmModelDef
from packnet_sfm_tpu.nn import (
    DepthResNet,
    PackNet01,
    PackNetSlim01,
    PoseNet,
    PoseResNet,
)
from packnet_sfm_tpu.engine.metrics import DepthMetricsConfig

MODEL_KINDS = ("SfmModel", "SelfSupModel", "SemiSupModel", "VelSupModel",
               "SemiSupCompletionModel", "GenericSfmModel", "GenericSelfSupModel")


def setup_depth_net(cfg: ConfigNode, dtype=None):
    """Resolve config.model.depth_net to a flax module (model_wrapper.py:382).

    ``dtype`` is the compute dtype (params stay f32; flax casts per-op).
    """
    name = cfg.name
    version = cfg.get("version", "")
    dropout = cfg.get("dropout", 0.0) or None
    # remat trades ~15-20% step time for activation HBM; off by default since
    # the fold-conv fusion removed the dominant activations (docs/DESIGN.md).
    # Turn on for HR configs (384x1280) or large per-chip batches.
    remat = bool(cfg.get("remat", False))
    if name == "PackNet01":
        return PackNet01(version=version[1:] or "A", dropout=dropout, dtype=dtype,
                         remat=remat)
    if name == "PackNetSlim01":
        return PackNetSlim01(version=version[1:] or "A", dropout=dropout, dtype=dtype,
                             remat=remat)
    if name == "DepthResNet":
        return DepthResNet(version=version.replace("pt", "") or "18")
    if name == "PackNetSAN01":
        from packnet_sfm_tpu.nn.packnet_san import PackNetSAN01
        return PackNetSAN01(version=version[1:] or "A", dropout=dropout)
    if name == "RaySurfaceResNet":
        from packnet_sfm_tpu.nn.raysurface import RaySurfaceResNet
        return RaySurfaceResNet(version=version.replace("pt", "") or "18")
    raise ValueError(f"Unknown depth net {name}")


def setup_pose_net(cfg: ConfigNode, dtype=None):
    """Resolve config.model.pose_net to a flax module (model_wrapper.py:411)."""
    name = cfg.name
    version = cfg.get("version", "")
    if name == "PoseNet":
        return PoseNet(dtype=dtype)
    if name == "PoseResNet":
        return PoseResNet(version=version.replace("pt", "") or "18")
    if name in ("", None):
        return None
    raise ValueError(f"Unknown pose net {name}")


def setup_model(cfg: ConfigNode, dtype=None) -> SfmModelDef:
    """Build the full SfmModelDef from config.model (model_wrapper.py:440)."""
    loss = cfg.loss
    depth_net = setup_depth_net(cfg.depth_net, dtype)
    needs_pose = cfg.name != "SfmModel" or cfg.pose_net.get("name")
    # Fully-supervised weight (w == 1) drops the pose net and the whole
    # photometric graph (reference SemiSupModel.py:60-70 skips pose/
    # photometric entirely at weight 1.0) — no wasted compute, and training
    # works on datasets without temporal contexts.
    if (cfg.name in ("SemiSupModel", "SemiSupCompletionModel")
            and loss.supervised_loss_weight >= 1.0):
        needs_pose = False
    pose_net = setup_pose_net(cfg.pose_net, dtype) if needs_pose else None
    photometric = MultiViewPhotometricConfig(
        num_scales=loss.num_scales,
        ssim_loss_weight=loss.ssim_loss_weight,
        smooth_loss_weight=loss.smooth_loss_weight,
        C1=loss.C1,
        C2=loss.C2,
        photometric_reduce_op=loss.photometric_reduce_op,
        clip_loss=loss.clip_loss,
        automask_loss=loss.automask_loss,
        padding_mode=loss.padding_mode,
    )
    supervised = SupervisedLossConfig(
        supervised_method=loss.supervised_method,
        supervised_num_scales=loss.supervised_num_scales,
    )
    if cfg.name not in MODEL_KINDS:
        raise ValueError(f"Unknown model {cfg.name}")
    input_keys = (("rgb", "input_depth", "intrinsics")
                  if cfg.name == "SemiSupCompletionModel" else ("rgb",))
    generic_photometric = None
    flip_lr_prob = loss.flip_lr_prob
    if cfg.name.startswith("Generic"):
        from packnet_sfm_tpu.losses.generic_photometric import \
            GenericPhotometricConfig
        generic_photometric = GenericPhotometricConfig(
            num_scales=1,
            ssim_loss_weight=loss.ssim_loss_weight,
            smooth_loss_weight=loss.smooth_loss_weight,
            photometric_reduce_op=loss.photometric_reduce_op,
            clip_loss=loss.clip_loss,
            automask_loss=loss.automask_loss,
            padding_mode=loss.padding_mode,
        )
        flip_lr_prob = 0.0  # reference GenericSfmModel has no flip TTA
    return SfmModelDef(
        depth_net=depth_net,
        pose_net=pose_net,
        kind=cfg.name,
        photometric=photometric,
        generic_photometric=generic_photometric,
        supervised=supervised,
        supervised_loss_weight=loss.supervised_loss_weight,
        velocity_loss_weight=loss.velocity_loss_weight,
        weight_rgbd=loss.get("weight_rgbd", 1.0),
        rotation_mode=loss.rotation_mode,
        flip_lr_prob=flip_lr_prob,
        upsample_depth_maps=loss.upsample_depth_maps,
        input_keys=input_keys,
    )


def setup_metrics_config(cfg: ConfigNode) -> DepthMetricsConfig:
    p = cfg.model.params
    return DepthMetricsConfig(
        crop=p.crop, min_depth=p.min_depth, max_depth=p.max_depth,
        scale_output=p.scale_output,
    )


def make_optimizer(
    optimizer_cfg: ConfigNode,
    scheduler_cfg: ConfigNode,
    steps_per_epoch: int,
) -> optax.GradientTransformation:
    """Adam with per-network LR + StepLR epoch decay (model_wrapper.py:128-153).

    Parameters are labeled by their top-level subtree ('depth_net'/'pose_net');
    the schedule decays by gamma every ``step_size`` epochs.
    """
    def schedule(base_lr: float):
        name = scheduler_cfg.get("name", "StepLR")
        if name == "StepLR":
            def fn(step):
                epoch = step // max(steps_per_epoch, 1)
                return base_lr * (scheduler_cfg.gamma ** (epoch // scheduler_cfg.step_size))
            return fn
        if name == "CosineAnnealingLR":
            return optax.cosine_decay_schedule(
                base_lr, scheduler_cfg.T_max * max(steps_per_epoch, 1))
        raise ValueError(f"Unknown scheduler {name}")

    def adam_for(sub: ConfigNode):
        tx = optax.adam(schedule(sub.lr))
        wd = sub.get("weight_decay", 0.0)
        if wd:
            # torch Adam's weight_decay adds wd*param to the gradient
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
        return tx

    if optimizer_cfg.get("name", "Adam").lower() != "adam":
        raise ValueError(f"Unknown optimizer {optimizer_cfg.get('name')}")

    def label_fn(params):
        return {k: ("pose" if k == "pose_net" else "depth") for k in params}

    return optax.multi_transform(
        {"depth": adam_for(optimizer_cfg.depth), "pose": adam_for(optimizer_cfg.pose)},
        label_fn,
    )
