"""Multi-process loader sharding: every process must yield the SAME batch
count (ADVICE r2 high — unequal shard lengths deadlock SPMD collectives),
with full eval coverage and wrapped duplicates landing on distinct processes.

Pure host-side tests (explicit process_index/process_count), no jax.distributed.
"""

import numpy as np
import pytest

from packnet_sfm_tpu.datasets.loader import DataLoader
from packnet_sfm_tpu.datasets.synthetic import SyntheticSfmDataset


def _loaders(n, pc, bs, drop_last):
    ds = SyntheticSfmDataset(length=n, height=8, width=16)
    return [DataLoader(ds, batch_size=bs, shuffle=False, drop_last=drop_last,
                       num_workers=1, process_index=i, process_count=pc)
            for i in range(pc)]


@pytest.mark.parametrize("n,pc,bs,drop_last", [
    (17, 2, 8, False),   # the ADVICE scenario: 2 vs 1 batches before the fix
    (17, 2, 8, True),
    (697, 4, 4, False),  # KITTI eigen_test val size
    (5, 3, 2, False),    # shard smaller than one batch
    (16, 2, 8, False),   # evenly divisible: no padding
])
def test_equal_batch_counts_and_coverage(n, pc, bs, drop_last):
    counts, covered = [], []
    for ld in _loaders(n, pc, bs, drop_last):
        batches = list(ld.epoch(0))
        assert len(batches) == len(ld), "len() must match actual batch count"
        counts.append(len(batches))
        for b in batches:
            assert b["rgb"].shape[0] == bs  # static shapes
            bsz = len(b["idx"]) - int(b.get("pad_count", 0))
            covered.extend(np.asarray(b["idx"][:bsz]).tolist())
    assert len(set(counts)) == 1, f"processes disagree on batch count: {counts}"
    if not drop_last:
        assert set(covered) == set(range(n)), "eval must see every sample"


def test_wrapped_duplicates_on_distinct_processes():
    """Shard-padding duplicates must never repeat within one process (the
    eval reduction averages cross-process duplicates via rows-sum/seen, but
    an intra-process duplicate would overwrite its row while double-counting
    seen)."""
    for n, pc in [(17, 2), (697, 4), (10, 3)]:
        for ld in _loaders(n, pc, 4, False):
            seen_here = []
            for b in ld.epoch(0):
                bsz = len(b["idx"]) - int(b.get("pad_count", 0))
                seen_here.extend(np.asarray(b["idx"][:bsz]).tolist())
            assert len(seen_here) == len(set(seen_here)), \
                f"intra-process duplicate in shard (n={n}, pc={pc})"


def test_shuffle_is_epoch_deterministic_across_processes():
    """All processes must derive the SAME global order per epoch (otherwise
    shards overlap/miss samples)."""
    lds = _loaders(33, 3, 4, False)
    per_proc = []
    for ld in lds:
        ld.shuffle = True
        idxs = []
        for b in ld.epoch(7):
            bsz = len(b["idx"]) - int(b.get("pad_count", 0))
            idxs.extend(np.asarray(b["idx"][:bsz]).tolist())
        per_proc.append(idxs)
    union = set().union(*[set(p) for p in per_proc])
    assert union == set(range(33))


def test_threaded_prefetch_matches_serial():
    """Sample-granular threaded prefetch (round-3 input-pipeline fix) must
    yield byte-identical batches in the same order as num_workers=1."""
    ds = SyntheticSfmDataset(length=13, height=8, width=16)
    serial = DataLoader(ds, batch_size=4, shuffle=True, drop_last=False,
                        num_workers=1, process_index=0, process_count=1)
    threaded = DataLoader(ds, batch_size=4, shuffle=True, drop_last=False,
                          num_workers=8, process_index=0, process_count=1)
    a, b = list(serial.epoch(3)), list(threaded.epoch(3))
    assert len(a) == len(b)
    for ba, bb in zip(a, b):
        assert ba.keys() == bb.keys()
        np.testing.assert_array_equal(ba["idx"], bb["idx"])
        np.testing.assert_array_equal(ba["rgb"], bb["rgb"])
        for ca, cb in zip(ba.get("rgb_context", []), bb.get("rgb_context", [])):
            np.testing.assert_array_equal(ca, cb)


def test_threaded_prefetch_uint8_jitter_path(tmp_path):
    """The default loader config (8-way sample-granular prefetch) over the
    REAL on-disk path: uint8 decode -> crop/resize -> ensure_float ->
    colorjitter. Pins transform determinism and dataset __getitem__ thread
    safety on the uint8 hot path (ADVICE r3 — the float SyntheticSfmDataset
    never exercises it)."""
    import os
    from PIL import Image
    from packnet_sfm_tpu.core.config import get_default_config
    from packnet_sfm_tpu.datasets.kitti import KITTIDataset
    from packnet_sfm_tpu.datasets.loader import make_transform

    root = tmp_path / "KITTI_raw"
    date = "2011_09_26"
    drive = f"{date}_drive_0001_sync"
    img_dir = root / date / drive / "image_02" / "data"
    os.makedirs(img_dir)
    rng = np.random.default_rng(7)
    for i in range(12):
        arr = (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"{i:010d}.png")
    P = "7.2e+02 0.0 3.2e+01 0.0 0.0 7.2e+02 2.4e+01 0.0 0.0 0.0 1.0 0.0"
    with open(root / date / "calib_cam_to_cam.txt", "w") as f:
        f.write(f"P_rect_02: {P}\n")
    split = root / "split.txt"
    with open(split, "w") as f:
        for i in range(12):
            f.write(f"{date}/{drive}/image_02/data/{i:010d}.png\n")

    aug = get_default_config().datasets.augmentation
    aug.image_shape = (32, 48)
    aug.jittering = (0.2, 0.2, 0.2, 0.05)
    aug.device_jitter = False     # the HOST-jitter path is under test here

    def make_loader(workers):
        # fresh transform + dataset per loader: any shared mutable RNG
        # state would otherwise hide a thread-safety bug
        tfm = make_transform("train", aug, seed=3)
        ds = KITTIDataset(str(root), str(split), depth_type=None,
                          back_context=1, forward_context=1,
                          data_transform=tfm)
        return DataLoader(ds, batch_size=4, shuffle=True, drop_last=False,
                          num_workers=workers, process_index=0,
                          process_count=1)

    a = list(make_loader(1).epoch(2))
    b = list(make_loader(8).epoch(2))
    assert len(a) == len(b) and len(a) > 0
    for ba, bb in zip(a, b):
        assert ba["rgb"].dtype == np.float32
        assert ba["rgb"].max() <= 1.0
        np.testing.assert_array_equal(ba["idx"], bb["idx"])
        np.testing.assert_array_equal(ba["rgb"], bb["rgb"])
        np.testing.assert_array_equal(ba["rgb_original"], bb["rgb_original"])
        for ca, cb in zip(ba["rgb_context"], bb["rgb_context"]):
            np.testing.assert_array_equal(ca, cb)
        # jitter actually ran (rgb differs from the un-jittered original)
        assert not np.allclose(ba["rgb"], ba["rgb_original"])
