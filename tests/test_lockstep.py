"""Lockstep N-step training-trajectory parity vs the torch reference.

Forward parity (test_networks.py) and loss-value parity (test_losses.py)
cannot catch a subtly wrong BACKWARD — e.g. through the fold-conv
merged-kernel construction, FastGroupNorm, or the stacked warp gather — that
would silently miss the abs_rel target on real data. With no KITTI data in
this environment, the strongest available proxy is trajectory parity: train
SelfSup PackNetSlim01+PoseNet in BOTH frameworks from identical initial
weights on an identical batch sequence (plain SGD, f32, no flip TTA), and
pin per-step loss agreement plus parameter-update direction agreement.

Matches reference training dynamics at trainers/horovod_trainer.py:73-103 +
losses/multiview_photometric_loss.py:287-344. Bound rationale: both sides
compute the same f32 math with different accumulation orders (XLA fusion vs
torch op-by-op), so per-step losses agree to ~5e-7 relative and update
cosines to ~1e-6 of unity; divergence compounds slowly (measured max 7.4e-6
rel loss / 1.2e-5 cosine defect over 50 steps — docs/PARITY.md, lockstep
section). The pinned bounds leave ~10x margin. This harness has teeth: it
caught a factor-2 smoothness-weight bug that every value-parity test had
passed over (the term is ~5e-4 of the total loss, under the old rtol), and
a wrong gradient term (missing automask branch, mis-scaled term, wrong
border correction) moves the step-1 update cosine well below it.
"""

import sys

import numpy as np
import pytest

N_STEPS = 50
BATCH, H, W, N_CTX = 2, 64, 96, 2
LR = 1e-2


def _smooth(rng, shape_hw, b, torch):
    """Smooth random images (low-res noise, bilinear-upsampled x8): gives the
    photometric warp well-behaved gradients, unlike per-pixel noise."""
    h, w = shape_hw
    base = rng.uniform(size=(b, 3, h // 8, w // 8)).astype(np.float32)
    up = torch.nn.functional.interpolate(
        torch.from_numpy(base), size=(h, w), mode="bilinear",
        align_corners=False)
    return np.ascontiguousarray(up.numpy())  # NCHW


def _make_batches(torch, n):
    rng = np.random.default_rng(42)
    K = np.zeros((BATCH, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 60.0
    K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = W / 2 - 0.5, H / 2 - 0.5, 1.0
    batches = []
    for _ in range(n):
        img = _smooth(rng, (H, W), BATCH, torch)
        ctx = [_smooth(rng, (H, W), BATCH, torch) for _ in range(N_CTX)]
        batches.append({"rgb": img, "rgb_context": ctx, "intrinsics": K})
    return batches


def _flat_ours(params, ti):
    import jax
    flat = ti._flatten_tree(jax.tree_util.tree_map(np.asarray, params))
    return np.concatenate([flat[k].ravel() for k in sorted(flat)])


def _flat_theirs(depth, pose, ti):
    tree = {
        "depth_net": ti.packnet_from_torch(ti.state_dict_to_numpy(depth.state_dict())),
        "pose_net": ti.posenet_from_torch(ti.state_dict_to_numpy(pose.state_dict())),
    }
    flat = ti._flatten_tree(tree)
    return np.concatenate([flat[k].ravel() for k in sorted(flat)])


def _cos(a, b):
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def run_lockstep(n_steps=N_STEPS, snap_steps=(1,),
                 photometric_reduce_op="min", automask=True,
                 smooth_loss_weight=0.001, ssim_loss_weight=0.85):
    """Train both frameworks in lockstep; return per-step losses and update
    cosines. ``snap_steps``: steps after which param vectors are compared
    (in addition to the final step). The loss knobs exist for diagnostics:
    'min'+automask has discrete selection branches whose near-ties flip
    under f32 rounding (macroscopic but unbiased gradient noise), while
    'mean' without automask is smooth."""
    torch = pytest.importorskip("torch")
    torch.set_num_threads(2)
    sys.path.insert(0, "/root/reference")
    try:
        from packnet_sfm.geometry.camera import Camera as _RefCamera
        from packnet_sfm.models.SelfSupModel import SelfSupModel as RefSelfSup
        from packnet_sfm.networks.depth.PackNetSlim01 import \
            PackNetSlim01 as RefDepth
        from packnet_sfm.networks.pose.PoseNet import PoseNet as RefPose
        _RefCamera.to = lambda self, *a, **k: self  # neutralize .cuda moves
    finally:
        sys.path.remove("/root/reference")

    import jax
    import jax.numpy as jnp
    import optax

    from packnet_sfm_tpu.core.config import get_default_config
    from packnet_sfm_tpu.engine.factory import setup_model
    from packnet_sfm_tpu.engine.train import (
        TrainState, make_train_step, zero_metrics)
    from packnet_sfm_tpu.models.sfm import init_model
    from packnet_sfm_tpu.parallel.mesh import make_mesh, shard_batch
    from packnet_sfm_tpu.utils import torch_import as ti

    # --- reference side -----------------------------------------------------
    torch.manual_seed(0)
    ref_depth = RefDepth(version="1A")
    ref_pose = RefPose(nb_ref_imgs=N_CTX)
    ref = RefSelfSup(
        rotation_mode="euler", flip_lr_prob=0.0, upsample_depth_maps=False,
        num_scales=4, ssim_loss_weight=ssim_loss_weight,
        smooth_loss_weight=smooth_loss_weight,
        photometric_reduce_op=photometric_reduce_op, automask_loss=automask,
        clip_loss=0.0)
    ref.add_depth_net(ref_depth)
    ref.add_pose_net(ref_pose)
    ref.train()
    ref_opt = torch.optim.SGD(ref.parameters(), lr=LR)

    # --- our side (identical weights via the conversion mapping) ------------
    cfg = get_default_config()
    cfg.model.name = "SelfSupModel"
    cfg.model.depth_net.name = "PackNetSlim01"
    cfg.model.depth_net.version = "1A"
    cfg.model.pose_net.name = "PoseNet"
    cfg.model.loss.flip_lr_prob = 0.0
    cfg.model.loss.photometric_reduce_op = photometric_reduce_op
    cfg.model.loss.automask_loss = automask
    cfg.model.loss.smooth_loss_weight = smooth_loss_weight
    cfg.model.loss.ssim_loss_weight = ssim_loss_weight
    model = setup_model(cfg.model)

    batches = _make_batches(torch, n_steps)
    init_batch = {
        "rgb": batches[0]["rgb"].transpose(0, 2, 3, 1),
        "rgb_context": [c.transpose(0, 2, 3, 1) for c in batches[0]["rgb_context"]],
        "intrinsics": batches[0]["intrinsics"],
    }
    variables = init_model(model, jax.random.PRNGKey(0), init_batch)
    # COPY the converted weights: state_dict_to_numpy returns numpy views of
    # the live torch tensors, and torch SGD updates in place — without the
    # copy, our "initial" weights would silently track the torch trajectory
    # one step ahead.
    copy = lambda tree: jax.tree_util.tree_map(
        lambda v: np.array(v, copy=True), tree)
    variables["params"]["depth_net"] = copy(
        ti.packnet_from_torch(ti.state_dict_to_numpy(ref_depth.state_dict())))
    variables["params"]["pose_net"] = copy(
        ti.posenet_from_torch(ti.state_dict_to_numpy(ref_pose.state_dict())))

    tx = optax.sgd(LR)
    mesh = make_mesh(num_devices=1)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, mesh, num_scales=4)
    acc = zero_metrics()

    flat_ours_prev = _flat_ours(state.params, ti)
    flat_theirs_prev = _flat_theirs(ref_depth, ref_pose, ti)
    np.testing.assert_array_equal(flat_ours_prev, flat_theirs_prev)

    losses_ours, losses_theirs, cosines = [], [], {}
    cum_prev = 0.0
    want_snaps = set(snap_steps) | {n_steps}
    for i, b in enumerate(batches):
        # torch step
        ref_opt.zero_grad()
        t = lambda x: torch.from_numpy(x)
        tb = {
            "rgb": t(b["rgb"]), "rgb_original": t(b["rgb"]),
            "rgb_context": [t(c) for c in b["rgb_context"]],
            "rgb_context_original": [t(c) for c in b["rgb_context"]],
            "intrinsics": t(b["intrinsics"]),
        }
        out = ref(tb, progress=0.0)
        out["loss"].backward()
        ref_opt.step()
        losses_theirs.append(float(out["loss"]))

        # our step (same images, NHWC)
        ours_b = {
            "rgb": b["rgb"].transpose(0, 2, 3, 1),
            "rgb_original": b["rgb"].transpose(0, 2, 3, 1),
            "rgb_context": [c.transpose(0, 2, 3, 1) for c in b["rgb_context"]],
            "rgb_context_original": [c.transpose(0, 2, 3, 1)
                                     for c in b["rgb_context"]],
            "intrinsics": b["intrinsics"],
        }
        state, acc = step(state, acc, shard_batch(ours_b, mesh), progress=0.0)
        cum = float(acc["loss"][0])
        losses_ours.append(cum - cum_prev)
        cum_prev = cum

        if (i + 1) in want_snaps:
            flat_ours = _flat_ours(state.params, ti)
            flat_theirs = _flat_theirs(ref_depth, ref_pose, ti)
            cosines[i + 1] = _cos(flat_ours - flat_ours_prev,
                                  flat_theirs - flat_theirs_prev)
            if i + 1 in snap_steps:
                # per-step delta for early steps: reset the baselines
                flat_ours_prev, flat_theirs_prev = flat_ours, flat_theirs

    return (np.asarray(losses_ours), np.asarray(losses_theirs), cosines)


@pytest.mark.slow
def test_lockstep_training_parity():
    losses_ours, losses_theirs, cosines = run_lockstep()

    rel = np.abs(losses_ours - losses_theirs) / np.abs(losses_theirs)
    # Step 0 is pure loss parity (pre-update weights): measured 4.2e-7.
    assert rel[0] < 1e-4, f"step-0 loss mismatch: {rel[0]:.2e}"
    # Drift compounds through the nonlinear landscape; measured max over
    # 50 steps is 7.4e-6 (docs/PARITY.md lockstep section). 1e-4 leaves
    # ~13x margin while still catching any term-level gradient error.
    assert rel.max() < 1e-4, f"trajectory diverged: max rel {rel.max():.2e}"
    # Update direction: step-1 catches a wrong gradient immediately
    # (measured 0.9999992) ...
    assert cosines[1] > 0.9999, f"step-1 update cosine {cosines[1]:.7f}"
    # ... and the cumulative step-1..N trajectory must keep pointing the
    # same way after 50 compounding steps (measured 0.999988).
    assert cosines[N_STEPS] > 0.999, \
        f"{N_STEPS}-step trajectory cosine {cosines[N_STEPS]:.7f}"
    # Both must actually be learning for the comparison to mean anything.
    assert losses_theirs[-1] < losses_theirs[0]


if __name__ == "__main__":
    import os
    import types as _types

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    # standalone run: the yacs/torchvision stubs normally come from conftest
    if "yacs" not in sys.modules:
        _yacs = _types.ModuleType("yacs")
        _yacs_config = _types.ModuleType("yacs.config")

        class _CfgNode(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError as e:
                    raise AttributeError(k) from e

            def __setattr__(self, k, v):
                self[k] = v

        _yacs_config.CfgNode = _CfgNode
        _yacs.config = _yacs_config
        sys.modules["yacs"] = _yacs
        sys.modules["yacs.config"] = _yacs_config
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            _tv = _types.ModuleType("torchvision")
            _tv_t = _types.ModuleType("torchvision.transforms")
            _tv_t.ToPILImage = object
            _tv.transforms = _tv_t
            sys.modules["torchvision"] = _tv
            sys.modules["torchvision.transforms"] = _tv_t
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=N_STEPS)
    ap.add_argument("--reduce", default="min")
    ap.add_argument("--no-automask", action="store_true")
    ap.add_argument("--smooth", type=float, default=0.001)
    ap.add_argument("--ssim", type=float, default=0.85)
    a = ap.parse_args()
    losses_ours, losses_theirs, cosines = run_lockstep(
        n_steps=a.steps, snap_steps=(1, 2, 5, 10, 25),
        photometric_reduce_op=a.reduce, automask=not a.no_automask,
        smooth_loss_weight=a.smooth, ssim_loss_weight=a.ssim)
    rel = np.abs(losses_ours - losses_theirs) / np.abs(losses_theirs)
    for i in range(len(losses_ours)):
        print(f"step {i:3d}: ours {losses_ours[i]:.6f} "
              f"theirs {losses_theirs[i]:.6f} rel {rel[i]:.2e}")
    print("update cosines:", {k: f"{v:.8f}" for k, v in sorted(cosines.items())})
    print(f"max rel loss diff: {rel.max():.2e}")
