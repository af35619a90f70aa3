"""Offline depth-map comparison CLI (reference scripts/evaluate_depth_maps.py):
compares folders of predicted vs ground-truth depth maps and prints the 7
metrics."""

from __future__ import annotations

import argparse
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Offline depth map evaluation")
    p.add_argument("--pred_folder", type=str, required=True)
    p.add_argument("--gt_folder", type=str, required=True)
    p.add_argument("--use_gt_scale", action="store_true")
    p.add_argument("--min_depth", type=float, default=0.0)
    p.add_argument("--max_depth", type=float, default=80.0)
    p.add_argument("--crop", type=str, default="", choices=["", "garg"])
    return p.parse_args()


def main():
    import jax.numpy as jnp

    from packnet_sfm_tpu.engine.metrics import (
        METRIC_NAMES, DepthMetricsConfig, compute_depth_metrics)
    from packnet_sfm_tpu.utils.save import load_depth

    args = parse_args()
    exts = (".npz", ".png")
    preds = sorted(f for f in os.listdir(args.pred_folder) if f.endswith(exts))
    gts = sorted(f for f in os.listdir(args.gt_folder) if f.endswith(exts))
    assert len(preds) == len(gts), "Wrong number of predicted depth maps"

    cfg = DepthMetricsConfig(crop=args.crop, min_depth=args.min_depth,
                             max_depth=args.max_depth)
    total = np.zeros(7)
    for pf, gf in zip(preds, gts):
        pred = load_depth(os.path.join(args.pred_folder, pf))[None, ..., None]
        gt = load_depth(os.path.join(args.gt_folder, gf))[None, ..., None]
        total += np.asarray(compute_depth_metrics(
            jnp.asarray(gt), jnp.asarray(pred), cfg, use_gt_scale=args.use_gt_scale))
    total /= len(preds)
    print("| " + " | ".join(f"{n:>8}" for n in METRIC_NAMES) + " |")
    print("| " + " | ".join(f"{v:8.3f}" for v in total) + " |")


if __name__ == "__main__":
    main()
