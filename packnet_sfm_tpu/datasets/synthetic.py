"""Procedural synthetic SfM dataset for tests and benchmarks.

Not present in the reference (it has no test data generator — SURVEY §4);
provides geometry-consistent samples: a textured scene with smooth depth,
context frames related by small known SE(3) motions, sparse gt depth, and gt
context poses. CPU-cheap and fully deterministic by (seed, idx).
"""

from __future__ import annotations

import numpy as np


def _texture(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Smooth random multi-frequency texture in [0, 1], [H, W, 3]."""
    ys, xs = np.mgrid[:h, :w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    for _ in range(6):
        fx, fy = rng.uniform(0.02, 0.3, size=2)
        phase = rng.uniform(0, 2 * np.pi, size=3)
        amp = rng.uniform(0.05, 0.25, size=3)
        for c in range(3):
            img[..., c] += amp[c] * np.sin(fx * xs + fy * ys + phase[c])
    img -= img.min()
    return (img / max(img.max(), 1e-6)).astype(np.float32)


class SyntheticSfmDataset:
    """Emits the canonical sample dict schema used by the trainer."""

    def __init__(self, length: int = 64, height: int = 64, width: int = 96,
                 seed: int = 0, train: bool = True, data_transform=None,
                 back_context: int = 1, forward_context: int = 1,
                 with_depth: bool = True, with_pose: bool = True, **kwargs):
        self.length = length
        self.h, self.w = height, width
        self.seed = seed
        self.train = train
        self.data_transform = data_transform
        self.n_ctx = back_context + forward_context
        self.with_depth = with_depth
        self.with_pose = with_pose

    def __len__(self):
        return self.length

    def __getitem__(self, idx: int) -> dict:
        rng = np.random.default_rng(self.seed * 100003 + idx)
        h, w = self.h, self.w
        rgb = _texture(rng, h, w)
        K = np.array([[0.6 * w, 0, w / 2 - 0.5],
                      [0, 0.6 * w, h / 2 - 0.5],
                      [0, 0, 1]], np.float32)
        sample = {
            "idx": idx,
            "filename": f"synthetic_{idx:010d}",
            "rgb": rgb,
            "intrinsics": K,
        }
        if self.with_depth:
            ys, xs = np.mgrid[:h, :w].astype(np.float32)
            depth = 5.0 + 10.0 * (0.5 + 0.5 * np.sin(xs / w * 3 + ys / h * 2))
            mask = rng.uniform(size=(h, w)) < 0.2  # sparse lidar-like
            sample["depth"] = (depth * mask).astype(np.float32)[..., None]
        if self.n_ctx > 0:
            ctx, poses = [], []
            for _ in range(self.n_ctx):
                shift = int(rng.integers(1, 4))
                ctx.append(np.roll(rgb, shift, axis=1).astype(np.float32))
                T = np.eye(4, dtype=np.float32)
                T[0, 3] = 0.1 * shift
                poses.append(T)
            sample["rgb_context"] = ctx
            if self.with_pose:
                sample["pose_context"] = poses
        if self.data_transform is not None:
            sample = self.data_transform(sample, idx=idx)
        return sample
