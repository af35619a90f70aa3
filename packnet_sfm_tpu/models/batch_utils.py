"""Batch-shape utilities (reference models/model_utils.py parity).

``stack_multicam_batch`` folds a multi-camera [B, N, ...] batch into
[B*N, ...] (reference ``stack_batch``, model_utils.py:68 — which only
supported B=1; this one is general). Flip helpers mirror
``flip_batch_input``/``flip_output`` (model_utils.py:97-150) and live inside
the model layer's traced flip logic (models/sfm.py)."""

from __future__ import annotations

from typing import Dict

import numpy as np


def stack_multicam_batch(batch: Dict) -> Dict:
    """Fold the camera axis of stacked multi-camera samples into the batch
    axis. Applies to arrays shaped [B, N, ...] where images are 5-D and
    intrinsics 4-D; context lists are folded element-wise."""
    rgb = batch.get("rgb")
    if rgb is None or rgb.ndim != 5:
        return batch
    b, n = rgb.shape[:2]

    def fold(x):
        return np.reshape(x, (b * n,) + x.shape[2:])

    out = {}
    for k, v in batch.items():
        if k == "jitter" and isinstance(v, np.ndarray) and v.shape[0] == b:
            # per-sample device-jitter factors: every camera of a sample
            # shares its factors (reference jitters per sample, not per cam)
            out[k] = np.repeat(v, n, axis=0)
        elif isinstance(v, np.ndarray) and v.ndim >= 3 and v.shape[:2] == (b, n):
            out[k] = fold(v)
        elif isinstance(v, list) and v and isinstance(v[0], np.ndarray) \
                and v[0].ndim >= 3 and v[0].shape[:2] == (b, n):
            out[k] = [fold(x) for x in v]
        else:
            out[k] = v
    return out
