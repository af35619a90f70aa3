"""Plain image-folder dataset (numbered frames, dummy intrinsics).

Parity: reference datasets/image_dataset.py — used for OmniCam/NRS training
where intrinsics are learned (dummy K: f=1000, centered).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from packnet_sfm_tpu.datasets.kitti import load_image_u8


def dummy_intrinsics(image: np.ndarray) -> np.ndarray:
    """f=1000, principal point centered (reference image_dataset.py:14-18)."""
    h, w = image.shape[:2]
    return np.array([[1000.0, 0.0, w / 2.0 - 0.5],
                     [0.0, 1000.0, h / 2.0 - 0.5],
                     [0.0, 0.0, 1.0]], np.float32)


class ImageFolderDataset:
    """Folder of numbered frames; context = neighboring file indices."""

    def __init__(self, root_dir: str, split: Optional[str] = None, train: bool = True,
                 data_transform=None, back_context: int = 0, forward_context: int = 0,
                 **kwargs):
        self.root_dir = root_dir
        self.train = train
        self.data_transform = data_transform
        self.backward_context = back_context
        self.forward_context = forward_context
        self.has_context = back_context + forward_context > 0

        if split:
            with open(os.path.join(root_dir, split) if not os.path.isabs(split)
                      else split) as f:
                files = [l.strip() for l in f if l.strip()]
            self.files = [os.path.join(root_dir, fn) for fn in files]
        else:
            exts = (".png", ".jpg", ".jpeg")
            self.files = sorted(
                os.path.join(root_dir, f) for f in os.listdir(root_dir)
                if f.lower().endswith(exts))
        if self.has_context:
            self.files = self.files[back_context:len(self.files) - forward_context]
            self._offset = back_context
        else:
            self._offset = 0

    def __len__(self):
        return len(self.files)

    def _neighbor(self, idx: int, delta: int) -> str:
        base = sorted(os.listdir(os.path.dirname(self.files[idx])))
        # files are numbered consecutively; use list position
        pos = self._offset + idx + delta
        folder = os.path.dirname(self.files[idx])
        return os.path.join(folder, base[pos])

    def __getitem__(self, idx: int) -> dict:
        rgb = load_image_u8(self.files[idx])
        sample = {
            "idx": idx,
            "filename": os.path.splitext(os.path.basename(self.files[idx]))[0],
            "rgb": rgb,
            "intrinsics": dummy_intrinsics(rgb),
        }
        if self.has_context:
            ctx = [self._neighbor(idx, -d) for d in range(self.backward_context, 0, -1)]
            ctx += [self._neighbor(idx, d) for d in range(1, self.forward_context + 1)]
            sample["rgb_context"] = [load_image_u8(f) for f in ctx]
        if self.data_transform is not None:
            sample = self.data_transform(sample, idx=idx)
        else:
            from packnet_sfm_tpu.datasets.augmentations import ensure_float_sample
            sample = ensure_float_sample(sample)
        return sample
