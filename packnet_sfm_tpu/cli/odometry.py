"""Ego-motion CLI: predict + refine a trajectory over an image sequence.

No reference counterpart (it never evaluates trajectories) — implements the
BASELINE pose-ATE pipeline: PoseNet odometry over consecutive frames,
optional direct photometric refinement and windowed pose-graph BA, KITTI
odometry-format output, and ATE/RPE against ground truth when provided.

    python -m packnet_sfm_tpu.cli.odometry --checkpoint <ckpt> \
        --input <frames_dir> [--gt poses.txt] [--output pred.txt] \
        [--refine-direct] [--refine-ba] [--image_shape H W]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="PackNet-SfM-TPU odometry")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--input", type=str, required=True,
                   help="folder of ordered frames")
    p.add_argument("--output", type=str, default=None,
                   help="KITTI-format poses txt to write")
    p.add_argument("--gt", type=str, default=None,
                   help="ground-truth KITTI odometry poses txt")
    p.add_argument("--image_shape", type=int, nargs=2, default=None)
    p.add_argument("--refine-direct", action="store_true",
                   help="direct photometric pose refinement per pair")
    p.add_argument("--refine-ba", action="store_true",
                   help="windowed pose-graph refinement")
    p.add_argument("--window", type=int, default=10)
    p.add_argument("--max-frames", type=int, default=0)
    return p.parse_args()


def run_odometry(checkpoint, input_dir, output=None, gt=None, image_shape=None,
                 refine_direct=False, refine_ba=False, window=10, max_frames=0):
    import jax

    from packnet_sfm_tpu.core.config import ConfigNode
    from packnet_sfm_tpu.datasets.augmentations import resize_image
    from packnet_sfm_tpu.datasets.kitti import load_image
    from packnet_sfm_tpu.egomotion.evaluation import (
        absolute_trajectory_error, load_kitti_odometry_poses,
        relative_pose_error, save_kitti_odometry_poses)
    from packnet_sfm_tpu.egomotion.odometry import (
        predict_relative_poses, predict_skip_poses, refine_relative_poses,
        refine_trajectory_windowed, trajectory_from_relative)
    from packnet_sfm_tpu.engine.checkpoint import restore_checkpoint
    from packnet_sfm_tpu.engine.factory import setup_model

    with open(os.path.join(checkpoint, "meta.json")) as f:
        meta = json.load(f)
    config = ConfigNode.from_dict(meta["config"])
    model = setup_model(config.model)
    state, _ = restore_checkpoint(checkpoint)
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]

    exts = (".png", ".jpg", ".jpeg")
    files = sorted(os.path.join(input_dir, f) for f in os.listdir(input_dir)
                   if f.lower().endswith(exts))
    if max_frames:
        files = files[:max_frames]
    shape = image_shape or tuple(config.datasets.augmentation.image_shape) or None
    frames = np.stack([
        resize_image(load_image(f), shape) if shape else load_image(f)
        for f in files])
    h, w = frames.shape[1:3]
    K = np.array([[0.58 * w, 0, w / 2 - 0.5],
                  [0, 1.92 * h, h / 2 - 0.5],
                  [0, 0, 1]], np.float32)  # KITTI-ish normalized intrinsics

    rel = predict_relative_poses(model, variables, frames)
    if refine_direct:
        rel = refine_relative_poses(model, variables, frames, K, rel)
    traj = trajectory_from_relative(rel)
    if refine_ba:
        # Independent skip-stride pose measurements give the window graph
        # real averaging power over chained-odometry drift.
        extra = (predict_skip_poses(model, variables, frames, stride=2)
                 + predict_skip_poses(model, variables, frames, stride=3))
        traj = refine_trajectory_windowed(traj, rel, window=window,
                                          extra_edges=extra)

    if output:
        save_kitti_odometry_poses(output, traj)
        print(f"wrote {len(traj)} poses -> {output}")
    if gt:
        gt_poses = load_kitti_odometry_poses(gt)[:len(traj)]
        ate = absolute_trajectory_error(traj, gt_poses, align_scale=True)
        rpe_t, rpe_r = relative_pose_error(traj, gt_poses)
        print(json.dumps({"ate_rmse_m": round(ate, 4),
                          "rpe_trans_m": round(rpe_t, 4),
                          "rpe_rot_deg": round(rpe_r, 4),
                          "frames": len(traj)}))
    return traj


def main():
    a = parse_args()
    run_odometry(a.checkpoint, a.input, a.output, a.gt, a.image_shape,
                 a.refine_direct, a.refine_ba, a.window, a.max_frames)


if __name__ == "__main__":
    main()
