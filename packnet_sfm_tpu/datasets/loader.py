"""Deterministic host-sharded data loader.

The TPU-native replacement for torch DataLoader + DistributedSampler
(reference model_wrapper.py:569-599): each host loads only its shard
(indices[process_index::process_count]), workers are threads prefetching
decode+augment, shuffling is seeded by (seed, epoch) so every run — and every
resume — sees the same order (fixes the reference's wall-clock worker
seeding, SURVEY §5.2). Batches are stacked numpy; device transfer +
mesh sharding happens in the engine (parallel/mesh.shard_batch).
"""

from __future__ import annotations

import functools
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import numpy as np

_STACK_KEYS = ("rgb", "rgb_original", "depth", "input_depth", "intrinsics",
               "pose", "jitter")
_LIST_KEYS = ("rgb_context", "rgb_context_original", "pose_context", "depth_context")


def collate(samples: Sequence[dict]) -> dict:
    """Stack a list of sample dicts into a batch dict (NHWC numpy)."""
    batch: dict = {}
    first = samples[0]
    for key in _STACK_KEYS:
        if key in first:
            batch[key] = np.stack([s[key] for s in samples])
    for key in _LIST_KEYS:
        if key in first:
            n_ctx = len(first[key])
            batch[key] = [np.stack([s[key][i] for s in samples])
                          for i in range(n_ctx)]
    if "idx" in first:
        batch["idx"] = np.asarray([s["idx"] for s in samples])
    if "filename" in first:
        batch["filename"] = [s["filename"] for s in samples]
    return batch


class DataLoader:
    """Deterministic, host-sharded, thread-prefetching loader."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 42,
        drop_last: bool = True,
        num_workers: int = 8,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        if process_index is None or process_count is None:
            import jax
            process_index = jax.process_index()
            process_count = jax.process_count()
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.process_index = process_index
        self.process_count = process_count

    def __len__(self) -> int:
        return len(self._batch_plan(0))

    def _shard(self, order: np.ndarray) -> np.ndarray:
        """This process's stride-shard of ``order``.

        The order is first padded (by wrapping, exactly like torch's
        DistributedSampler) to a multiple of process_count so every process
        gets the SAME shard length and therefore the SAME batch count.
        Unequal shard lengths would make one process issue an extra SPMD
        collective step and deadlock every host (the jitted steps are
        collective over the global mesh). Each wrapped duplicate lands on a
        *different* process (pad < process_count), so eval's cross-process
        rows-sum/seen-count reduction averages them out exactly.
        """
        n = len(order)
        if self.process_count > 1 and n % self.process_count:
            total = -(-n // self.process_count) * self.process_count
            order = np.concatenate([order, order[: total - n]])
        return order[self.process_index::self.process_count]

    def _batch_plan(self, epoch: int) -> list:
        """List of (idxs [batch_size], pad_count) for this process.

        Eval loaders on datasets exposing ``sample_shape(idx)`` (e.g. KITTI
        native-resolution gt depth: eigen_test mixes 1242/1241/1226-wide
        maps) are bucketed by shape so batches stay homogeneous — batch>1
        eval on mixed-size data with ONE compile per distinct shape and
        metrics identical to the B=1 oracle (no resampling/padding of gt).
        """
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(
                np.random.SeedSequence([self.seed, epoch])).permutation(n)
        sample_shape = getattr(self.dataset, "sample_shape", None)
        if sample_shape is not None and not self.drop_last:
            groups: dict = {}
            for i in order:
                groups.setdefault(tuple(sample_shape(int(i))), []).append(i)
            # deterministic bucket order shared by all processes
            buckets = [np.asarray(groups[k]) for k in sorted(groups)]
        else:
            buckets = [order]
        plan = []
        for bucket in buckets:
            shard = self._shard(bucket)
            nb = len(shard) // self.batch_size if self.drop_last \
                else -(-len(shard) // self.batch_size)
            for bi in range(nb):
                idxs = shard[bi * self.batch_size:(bi + 1) * self.batch_size]
                pad = self.batch_size - len(idxs)
                if pad:
                    # pad by wrapping so shapes stay static; 'pad_count'
                    # marks them (np.resize wraps cyclically, so shards
                    # smaller than one batch still fill up)
                    idxs = np.concatenate([idxs, np.resize(shard, pad)])
                plan.append((idxs, pad))
        return plan

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        """Iterate batches for ``epoch`` (order is a pure function of
        (seed, epoch)).

        Prefetch is at SAMPLE granularity: every worker thread decodes one
        sample (PIL/libjpeg/cv2 all release the GIL), and batches are
        assembled in plan order on the consumer thread. The old batch-
        granular prefetch serialized each batch's batch_size*3 decodes on
        one thread and capped parallelism at the batch depth (measured 10
        imgs/s vs the chip's ~40; docs/STATUS.md round-4 input pipeline)."""
        plan = self._batch_plan(epoch)
        nb = len(plan)

        def assemble(samples, pad: int) -> dict:
            batch = collate(samples)
            if pad:
                batch["pad_count"] = pad
            return batch

        if self.num_workers <= 1:
            for idxs, pad in plan:
                yield assemble([self.dataset[int(i)] for i in idxs], pad)
            return
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            # enough batches in flight to keep every worker busy
            depth = min(nb, max(2, -(-2 * self.num_workers // self.batch_size)))

            def submit(bi: int):
                idxs, pad = plan[bi]
                return [pool.submit(self.dataset.__getitem__, int(i))
                        for i in idxs], pad
            inflight = {bi: submit(bi) for bi in range(depth)}
            next_submit = depth
            for bi in range(nb):
                futures, pad = inflight.pop(bi)
                samples = [f.result() for f in futures]
                if next_submit < nb:
                    inflight[next_submit] = submit(next_submit)
                    next_submit += 1
                yield assemble(samples, pad)


def make_transform(mode: str, aug_cfg, seed: int = 42):
    """Build the per-sample transform for a split (reference get_transforms,
    transforms.py:95)."""
    from packnet_sfm_tpu.datasets.augmentations import eval_transform, train_transform

    image_shape = tuple(aug_cfg.get("image_shape", ()) or ())
    if mode == "train":
        jitter = tuple(aug_cfg.get("jittering", ()) or ())
        crop = tuple(aug_cfg.get("crop_train_borders", ()) or ())
        device_jitter = bool(aug_cfg.get("device_jitter", True))
        resize_filter = str(aug_cfg.get("resize_filter", "area"))

        def tf(sample, idx=0):
            rng = np.random.default_rng(np.random.SeedSequence([seed, idx]))
            return train_transform(sample, image_shape, jitter, crop, rng,
                                   device_jitter=device_jitter,
                                   resize_filter=resize_filter)
        return tf
    crop = tuple(aug_cfg.get("crop_eval_borders", ()) or ())

    def tf(sample, idx=0):
        return eval_transform(sample, image_shape, crop,
                              depth_preserve_input=(mode == "validation"))
    return tf


class RepeatDataset:
    """Repeat a dataset N times per epoch (reference uses ConcatDataset,
    model_wrapper.py:521-525)."""

    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = times

    def __len__(self):
        return len(self.dataset) * self.times

    def __getitem__(self, idx):
        return self.dataset[idx % len(self.dataset)]


class ConcatDataset:
    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def __getitem__(self, idx):
        di = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[di][idx - int(self._offsets[di])]


def setup_dataset(cfg, mode: str, aug_cfg, seed: int = 42, requirements=None):
    """Instantiate datasets named in a split config (reference
    model_wrapper.py:474-560). Returns a list (one per dataset entry)."""
    from packnet_sfm_tpu.datasets.image_folder import ImageFolderDataset
    from packnet_sfm_tpu.datasets.kitti import KITTIDataset
    from packnet_sfm_tpu.datasets.synthetic import SyntheticSfmDataset

    requirements = requirements or {}
    tfm = make_transform(mode if mode == "train" else
                         ("validation" if mode == "validation" else "test"),
                         aug_cfg, seed)
    datasets = []
    for i, name in enumerate(cfg.dataset):
        # Enforce the model's train-data requirements (reference
        # _train_requirements protocol, setup_dataset model_wrapper.py:474):
        # a supervised/completion model cannot train without the gt signal.
        if mode == "train" and name not in ("Synthetic",):
            if requirements.get("gt_depth") and not cfg.depth_type[i]:
                raise ValueError(
                    f"Model requires gt depth but train dataset {i} ({name}) "
                    "has no depth_type configured")
            if requirements.get("input_depth") and not (
                    i < len(cfg.input_depth_type) and cfg.input_depth_type[i]):
                raise ValueError(
                    f"Model requires input (lidar) depth but train dataset "
                    f"{i} ({name}) has no input_depth_type configured")
        common = dict(
            train=(mode == "train"),
            data_transform=tfm,
            back_context=cfg.back_context,
            forward_context=cfg.forward_context,
        )
        if name == "KITTI":
            split = cfg.split[i]
            path = cfg.path[i]
            ds = KITTIDataset(
                path,
                split if split.startswith("/") else f"{path}/{split}",
                depth_type=cfg.depth_type[i],
                input_depth_type=(cfg.input_depth_type[i]
                                  if i < len(cfg.input_depth_type) else None),
                with_pose=requirements.get("gt_pose", False),
                **common,
            )
        elif name == "Image":
            ds = ImageFolderDataset(cfg.path[i], split=cfg.split[i] or None, **common)
        elif name == "Synthetic":
            ds = SyntheticSfmDataset(
                seed=seed + i,
                length=cfg.get("synthetic_length", 64),
                height=cfg.get("synthetic_height", 64),
                width=cfg.get("synthetic_width", 96),
                **common)
        elif name == "DGP":
            from packnet_sfm_tpu.datasets.ddad import DDADDataset
            ds = DDADDataset(
                cfg.path[i], cfg.split[i],
                depth_type=cfg.depth_type[i],
                cameras=cfg.cameras[i] if i < len(cfg.cameras) else None,
                **common,
            )
        else:
            raise ValueError(f"Unknown dataset {name}")
        repeat = cfg.get("repeat", [1])
        if mode == "train" and i < len(repeat) and repeat[i] > 1:
            ds = RepeatDataset(ds, repeat[i])
        datasets.append(ds)
    return datasets


def setup_dataloader(datasets, cfg, mode: str, seed: int = 42):
    """DataLoaders for each dataset of a split (model_wrapper.py:569-599).

    Train drops the last partial batch (static shapes, one compile);
    validation/test must see EVERY sample (reference eval protocol,
    horovod_trainer.py:105-155 + utils/reduce.py seen-count assert), so the
    last batch is padded by wrapping and pad rows are masked downstream.
    """
    return [
        DataLoader(
            d,
            batch_size=cfg.batch_size,
            shuffle=(mode == "train"),
            seed=seed,
            drop_last=(mode == "train"),
            num_workers=cfg.get("num_workers", 8),
        )
        for d in datasets
    ]
