"""Trainer: epoch orchestration over the jitted steps.

Capability parity with reference trainers/{base_trainer,horovod_trainer}.py +
models/model_wrapper.py step/epoch plumbing, TPU-first:

- One jit-compiled train step per (shape, scale-count); the epoch loop is
  host-side Python feeding sharded device batches.
- Progressive scaling resolved host-side per epoch (static recompile at
  schedule boundaries only).
- Validation reduces per-batch [7]-metric vectors with pad-aware weights;
  with multiple hosts, metric math is already global because eval batches are
  globally sharded (replacing reference utils/reduce.py allreduce).
- First-class timing: per-epoch imgs/s and optional jax.profiler traces
  (reference has none — SURVEY §5.1).
"""

from __future__ import annotations

import os
import tempfile
import time
from typing import Dict, List, Optional

import jax
import numpy as np

from packnet_sfm_tpu.core.config import ConfigNode
from packnet_sfm_tpu.datasets.loader import setup_dataloader, setup_dataset
from packnet_sfm_tpu.engine.checkpoint import ModelCheckpoint, restore_checkpoint
from packnet_sfm_tpu.engine.factory import (
    make_optimizer,
    setup_metrics_config,
    setup_model,
)
from packnet_sfm_tpu.engine.metrics import METRIC_NAMES
from packnet_sfm_tpu.engine.train import TrainState, make_eval_step, make_train_step
from packnet_sfm_tpu.losses.progressive import progressive_num_scales
from packnet_sfm_tpu.models.sfm import init_model
from packnet_sfm_tpu.parallel.mesh import make_mesh, shard_batch

EVAL_MODES = ("depth", "depth_pp", "depth_gt", "depth_pp_gt")


def _device_batch(batch: Dict) -> Dict:
    """Strip host-only keys and fold multi-camera axes before transfer."""
    from packnet_sfm_tpu.models.batch_utils import stack_multicam_batch

    batch = stack_multicam_batch(batch)
    return {k: v for k, v in batch.items()
            if k not in ("filename", "idx", "pad_count")}


class Trainer:
    """End-to-end training driver built from a config tree."""

    def __init__(self, config: ConfigNode, mesh=None, profile_dir: Optional[str] = None):
        self.config = config
        self.mesh = mesh if mesh is not None else make_mesh()
        _dtype = (jax.numpy.bfloat16 if config.arch.get("dtype") == "bfloat16"
                  else None)
        self.model = setup_model(config.model, dtype=_dtype)
        self.metrics_cfg = setup_metrics_config(config)
        self.seed = config.arch.seed
        self.max_epochs = config.arch.max_epochs
        # arch.min_epochs is a floor on the epoch count (reference
        # base_trainer.py:22-26 stores it but never consumes it — here it
        # actually guarantees at least that many epochs run).
        self.min_epochs = config.arch.get("min_epochs", 0)
        self.current_epoch = 0
        self.profile_dir = profile_dir
        self.compute_dtype = (
            jax.numpy.bfloat16 if config.arch.get("dtype") == "bfloat16"
            else jax.numpy.float32)

        # Train-data requirements by model kind (reference BaseModel
        # _train_requirements, base_model.py:22 + SemiSupModel.py:43,
        # SemiSupCompletionModel.py:38, VelSupModel.py:26): which gt signals
        # the train split must load. setup_dataset validates them.
        req = {"gt_pose": config.model.name == "VelSupModel",
               "gt_depth": config.model.name in (
                   "SemiSupModel", "SemiSupCompletionModel"),
               "input_depth": config.model.name == "SemiSupCompletionModel"}
        aug = config.datasets.augmentation
        self.train_datasets = setup_dataset(
            config.datasets.train, "train", aug, self.seed, req)
        self.val_datasets = setup_dataset(
            config.datasets.validation, "validation", aug, self.seed, req)
        self.test_datasets = setup_dataset(
            config.datasets.test, "test", aug, self.seed, req)
        self.train_loaders = setup_dataloader(
            self.train_datasets, config.datasets.train, "train", self.seed)
        self.val_loaders = setup_dataloader(
            self.val_datasets, config.datasets.validation, "validation", self.seed)
        self.test_loaders = setup_dataloader(
            self.test_datasets, config.datasets.test, "test", self.seed)

        steps_per_epoch = sum(len(l) for l in self.train_loaders) or 1
        self.tx = make_optimizer(
            config.model.optimizer, config.model.scheduler, steps_per_epoch)

        self.state: Optional[TrainState] = None
        self._train_steps: Dict[int, callable] = {}
        # Preemption handling (upgrade over the reference, which dies
        # atomically on SIGTERM — SURVEY §5.3): SIGTERM/SIGINT set a flag,
        # the loops drain at the next batch boundary, and an emergency
        # checkpoint is written so a re-launch resumes the interrupted epoch.
        self._preempt_requested = False
        self.eval_step = make_eval_step(
            self.model, self.mesh, self.metrics_cfg, self.compute_dtype)

        # W&B logging (rank 0 only, reference scripts/train.py:45-46)
        from packnet_sfm_tpu.utils.wandb_logger import WandbLogger
        self.logger = None
        if jax.process_index() == 0 and not config.wandb.get("dry_run", True):
            self.logger = WandbLogger(**config.wandb.to_dict())
            self.logger.log_config(config.to_dict())

        ckpt_dir = config.checkpoint.get("filepath") or ""
        # Run-name feedback: adopt the wandb-assigned run name into the
        # config and the checkpoint path (reference prep_logger_and_checkpoint,
        # utils/config.py:107-134, which rewrites the run-name component of
        # the path; our filepath is a plain directory, so the run name
        # becomes a subdirectory of it).
        if self.logger is not None and self.logger.run_name:
            run_name = self.logger.run_name
            config.name = run_name
            config.wandb.name = run_name
            if self.logger.run_url:
                config.wandb.url = self.logger.run_url
            if ckpt_dir:
                ckpt_dir = os.path.join(ckpt_dir, run_name)
                config.checkpoint.filepath = ckpt_dir
            self.logger.log_config(config.to_dict())
        self.checkpoint = ModelCheckpoint(
            ckpt_dir, monitor=config.checkpoint.monitor,
            save_top_k=config.checkpoint.save_top_k,
            mode=config.checkpoint.mode,
            s3_path=config.checkpoint.get("s3_path", ""),
            s3_frequency=config.checkpoint.get("s3_frequency", 1)) \
            if ckpt_dir else None

    # ------------------------------------------------------------------ state

    def init_state(self, sample_batch: Dict):
        variables = init_model(
            self.model, jax.random.PRNGKey(self.seed), _device_batch(sample_batch))
        # ImageNet-pretrained encoder init for '18pt'/'50pt' versions
        # (reference resnet_encoder.py:78-97): weights come from an npz
        # artifact (cli/convert_checkpoint.py --imagenet) named by
        # pretrained_path or found under $PN_PRETRAINED_DIR/resnet<N>.npz.
        from packnet_sfm_tpu.engine.checkpoint import load_pretrained_encoder
        for net in ("depth_net", "pose_net"):
            net_cfg = self.config.model[net]
            version = net_cfg.get("version", "") or ""
            if not version.endswith("pt"):
                continue
            if net_cfg.get("name") not in ("DepthResNet", "PoseResNet",
                                           "RaySurfaceResNet"):
                continue
            depth = version[:-2] or "18"
            path = net_cfg.get("pretrained_path", "")
            if not path:
                pre_dir = os.environ.get("PN_PRETRAINED_DIR", "")
                cand = os.path.join(pre_dir, f"resnet{depth}.npz")
                path = cand if pre_dir and os.path.exists(cand) else ""
            if path:
                n_images = 2 if net_cfg.get("name") == "PoseResNet" else 1
                variables = load_pretrained_encoder(
                    path, variables, net, num_input_images=n_images)
            else:
                print(f"### WARNING: {net} version {version} requests "
                      "ImageNet weights but no pretrained artifact was found "
                      f"(set model.{net}.pretrained_path or "
                      "$PN_PRETRAINED_DIR); training from scratch")
        # Optional per-network partial checkpoint loads
        # (reference model_wrapper.py:405-407 + utils/load.py:114).
        from packnet_sfm_tpu.engine.checkpoint import load_network
        for net in ("depth_net", "pose_net"):
            ckpt = self.config.model[net].get("checkpoint_path", "")
            if ckpt:
                variables = load_network(ckpt, variables, net)
        if self.config.model.get("checkpoint_path"):
            for net in ("depth_net", "pose_net"):
                variables = load_network(
                    self.config.model.checkpoint_path, variables, net)
        from packnet_sfm_tpu.engine.train import replicate_state
        self.state = replicate_state(TrainState.create(
            variables, self.tx, rng=jax.random.PRNGKey(self.seed + 1)), self.mesh)
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
        print(f"### Initialized model with {n_params / 1e6:.2f}M parameters")

    def resume(self, ckpt_path: str):
        """Restore state + epoch from a checkpoint (reference train.py resume)."""
        if self.state is None:
            first = next(iter(self.train_loaders[0].epoch(0)))
            self.init_state(first)
        self.state, meta = restore_checkpoint(ckpt_path, self.state)
        self.current_epoch = meta["epoch"] + 1
        print(f"### Resumed from {ckpt_path} at epoch {self.current_epoch}")

    def _train_step_for(self, num_scales: int):
        if num_scales not in self._train_steps:
            self._train_steps[num_scales] = make_train_step(
                self.model, self.tx, self.mesh, num_scales, self.compute_dtype,
                grad_accum=self.config.arch.get("grad_accum", 1))
        return self._train_steps[num_scales]

    # ------------------------------------------------------------------ loops

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        progress = epoch / max(self.max_epochs, 1)
        loss_cfg = self.config.model.loss
        num_scales = progressive_num_scales(
            progress, loss_cfg.num_scales, loss_cfg.progressive_scaling)
        step_fn = self._train_step_for(num_scales)

        from packnet_sfm_tpu.engine.train import zero_metrics

        acc = zero_metrics()
        images = 0
        t0 = time.perf_counter()
        # Multi-process preemption must be AGREED: the SIGTERM lands on one
        # process, but all processes have to leave at the same batch boundary
        # or the survivors deadlock on the next collective. The tiny flag
        # allgather runs every `preempt_sync_every` batches (default 8) so
        # the per-step pipeline stays collective-free between checks.
        sync_every = max(int(self.config.arch.get("preempt_sync_every", 8)), 1)
        multiproc = jax.process_count() > 1
        from packnet_sfm_tpu.parallel.mesh import any_process_flag
        for loader in self.train_loaders:
            for bi, batch in enumerate(loader.epoch(epoch)):
                if multiproc:
                    if bi % sync_every == 0 and any_process_flag(
                            self._preempt_requested):
                        self._preempt_requested = True
                        break
                elif self._preempt_requested:
                    break
                sharded = shard_batch(_device_batch(batch), self.mesh)
                self.state, acc = step_fn(self.state, acc, sharded, progress)
                images += batch["rgb"].shape[0]
            if self._preempt_requested:
                break
        # single host fetch per epoch (per-step fetches would serialize the
        # device pipeline, especially over remote backends)
        acc_host = jax.device_get(acc)
        dt = time.perf_counter() - t0
        avg = {k: float(v[0] / max(v[1], 1.0)) for k, v in acc_host.items()
               if v[1] > 0}
        avg["imgs_per_sec"] = images / dt if dt > 0 else 0.0
        return avg

    def validate(self, epoch: int, loaders: Optional[List] = None,
                 save_folder: Optional[str] = None) -> List[Dict]:
        """Full eval protocol (reference utils/reduce.py:31-80
        ``all_reduce_metrics`` + horovod_trainer.py:105-155):

        - every sample is evaluated exactly once (loaders pad the last batch
          by wrapping; pad rows are masked out here on the host);
        - per-sample [B,7] metric rows are scattered by dataset index;
        - rows and seen-counts are summed across processes, coverage is
          asserted (every index seen >= 1), and the mean is taken over
          rows / seen so duplicates never skew the result.
        """
        from packnet_sfm_tpu.parallel.mesh import (
            all_reduce_host_sum,
            host_local_rows,
        )

        loaders = loaders if loaders is not None else self.val_loaders
        results = []
        for di, loader in enumerate(loaders):
            n_total = len(loader.dataset)
            rows = {m: np.zeros((n_total, 7), np.float64) for m in EVAL_MODES}
            seen = np.zeros(n_total, np.float64)
            has_depth = False
            n_batches = len(loader)
            log_interval = max(n_batches // max(
                int(self.config.wandb.get("num_logs", 5)), 1), 1)
            global_step = (int(jax.device_get(self.state.step))
                           if self.logger is not None else 0)
            for bi, batch in enumerate(loader.epoch(epoch)):
                if "depth" not in batch:
                    continue
                has_depth = True
                idx = np.asarray(batch["idx"])
                bsz = len(idx) - int(batch.get("pad_count", 0))
                sharded = shard_batch(_device_batch(batch), self.mesh)
                out = self.eval_step(self.state, sharded)
                for m in EVAL_MODES:
                    r = host_local_rows(out[m])       # [B*cams, 7]
                    if r.shape[0] != len(idx):        # multi-camera batches:
                        k = r.shape[0] // len(idx)    # one row per sample =
                        r = r.reshape(len(idx), k, 7).mean(axis=1)  # cam mean
                    rows[m][idx[:bsz]] = r[:bsz]
                seen[idx[:bsz]] += 1.0
                if save_folder:
                    self._save_depth_outputs(save_folder, batch, out, bsz)
                if (self.logger is not None and bi % log_interval == 0
                        and bsz > 0):
                    # interval-sampled rgb/inv-depth/gt image logging
                    # (reference wandb_logger.py:133-172, called from
                    # validation_step — model_wrapper.py:192-202)
                    def first(x):
                        x = np.asarray(x)
                        while x.ndim > 3:
                            x = x[0]
                        return x
                    self.logger.log_depth_images(
                        first(batch["rgb"]),
                        first(host_local_rows(out["inv_depth"])),
                        first(batch["depth"]),
                        prefix=f"val{di}-batch{bi}", step=global_step)
            if not has_depth:
                # A silent all-zero metric table would mask a misconfigured
                # split (e.g. wrong depth_type) — fail loudly instead.
                raise ValueError(
                    f"Eval dataset {di} yielded no ground-truth depth: check "
                    "the split's depth_type configuration (every batch was "
                    "missing the 'depth' key)")
            reduced = all_reduce_host_sum({"rows": rows, "seen": seen})
            rows, seen = reduced["rows"], reduced["seen"]
            assert not np.any(seen == 0), \
                "Not all samples were seen during evaluation"
            results.append(
                {m: (rows[m] / seen[:, None]).mean(axis=0) for m in EVAL_MODES})
        return results

    def _save_depth_outputs(self, folder: str, batch, out, bsz: int):
        """Test-time depth writers (reference utils/save.py:11 ``save_depth``):
        npz/png depth + rgb/viz side-by-side per save.depth config flags."""
        import os

        from PIL import Image

        from packnet_sfm_tpu.utils.save import write_depth
        from packnet_sfm_tpu.utils.viz import viz_inv_depth

        from packnet_sfm_tpu.parallel.mesh import host_local_rows

        flags = self.config.save.depth
        inv_depth = host_local_rows(out["inv_depth"])
        names = batch.get("filename") or [
            f"sample_{int(i):010d}" for i in batch.get("idx", range(bsz))]
        for i in range(bsz):
            base = os.path.join(folder, str(names[i]))
            depth_i = 1.0 / np.clip(inv_depth[i, ..., 0], 1e-6, None)
            if flags.get("npz", True):
                write_depth(base + ".npz", depth_i,
                            intrinsics=batch["intrinsics"][i])
            if flags.get("png", True):
                write_depth(base + ".png", depth_i)
            if flags.get("viz", True) or flags.get("rgb", True):
                viz = viz_inv_depth(inv_depth[i, ..., 0])
                panels = []
                if flags.get("rgb", True):
                    rgb = np.asarray(batch["rgb"][i])
                    if rgb.shape[:2] != viz.shape[:2]:
                        from packnet_sfm_tpu.datasets.augmentations import \
                            resize_image
                        rgb = resize_image(rgb, viz.shape[:2])
                    panels.append(rgb)
                if flags.get("viz", True):
                    panels.append(viz)
                img = (np.concatenate(panels, axis=0) * 255).astype(np.uint8)
                os.makedirs(os.path.dirname(base) or ".", exist_ok=True)
                Image.fromarray(img).save(base + "_viz.png")

    def _install_preemption_handlers(self):
        import signal

        def handler(signum, _frame):
            self._preempt_requested = True
            print(f"### Caught signal {signum}: checkpointing at the next "
                  "batch boundary, then exiting", flush=True)

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, handler)
            except ValueError:
                pass  # not the main thread (e.g. under a test runner)

    def _emergency_save(self, epoch: int) -> Optional[str]:
        """Checkpoint the live state mid-run so the interrupted epoch can be
        redone on re-launch (`train <path>` restores config+state+epoch).

        Runs on ALL processes: orbax synchronizes every process during a
        save, so a rank-0-only call would hang in that barrier while the
        other ranks exit (caught by the distributed preemption test);
        save_checkpoint itself keeps filesystem writes on rank 0.
        """
        from packnet_sfm_tpu.engine.checkpoint import save_checkpoint
        ckpt_dir = (self.config.checkpoint.get("filepath")
                    or os.path.join(tempfile.gettempdir(), "packnet_sfm_preempt"))
        path = os.path.join(ckpt_dir, f"preempt_epoch={epoch:02d}.ckpt")
        # resume() restores at meta.epoch + 1, so record epoch-1 to redo it
        save_checkpoint(path, self.state, self.config.to_dict(), epoch - 1)
        if jax.process_index() == 0:
            print(f"### Preempted: saved {path}; resume with `cli.train {path}`",
                  flush=True)
        return path

    def fit(self):
        """Full training loop (reference horovod_trainer.py:32-71)."""
        self._install_preemption_handlers()
        if self.state is None:
            first = next(iter(self.train_loaders[0].epoch(0)))
            self.init_state(first)
        if self.config.arch.get("validate_first"):
            self.print_metrics(self.validate(0))
        for epoch in range(self.current_epoch,
                           max(self.max_epochs, self.min_epochs)):
            if self.profile_dir and epoch == 1:
                jax.profiler.start_trace(self.profile_dir)
            train_metrics = self.train_epoch(epoch)
            if self.profile_dir and epoch == 1:
                jax.profiler.stop_trace()
            # Agree again at the epoch boundary: a signal landing after the
            # loop's last sync point would otherwise drain one process while
            # the others enter validation's collectives (deadlock). Every
            # process reaches this point (the in-loop drain is agreed).
            from packnet_sfm_tpu.parallel.mesh import any_process_flag
            if any_process_flag(self._preempt_requested):
                self._preempt_requested = True
                self._emergency_save(epoch)
                return
            val_metrics = self.validate(epoch)
            print(f"Epoch {epoch:03d} | loss {train_metrics.get('loss', 0):.4f} | "
                  f"{train_metrics['imgs_per_sec']:.1f} imgs/s")
            self.print_metrics(val_metrics)
            if self.logger is not None:
                step = int(jax.device_get(self.state.step))
                logged = {f"train/{k}": v for k, v in train_metrics.items()}
                for di, res in enumerate(val_metrics):
                    for m in EVAL_MODES:
                        for mi, name in enumerate(METRIC_NAMES):
                            logged[f"val{di}/{m}/{name}"] = float(res[m][mi])
                self.logger.log_metrics(logged, step)
            # every process calls check_and_save (metrics are globally
            # reduced, so the decision is identical; the orbax save requires
            # all processes — see engine/checkpoint.save_checkpoint)
            if self.checkpoint is not None:
                flat = {"loss": train_metrics.get("loss", 0.0)}
                for di, res in enumerate(val_metrics):
                    for m in EVAL_MODES:
                        for mi, name in enumerate(METRIC_NAMES):
                            flat[f"{m}_{name}"] = float(res[m][mi])
                            flat[f"{di}-{m}_{name}"] = float(res[m][mi])
                self.checkpoint.check_and_save(
                    self.state, self.config.to_dict(), epoch, flat)
            self.current_epoch = epoch + 1

    def test(self) -> List[Dict]:
        if self.state is None:
            raise RuntimeError("No state: init or resume first")
        save_folder = self.config.save.get("folder", "")
        results = self.validate(0, loaders=self.test_loaders,
                                save_folder=save_folder or None)
        self.print_metrics(results)
        return results

    # ---------------------------------------------------------------- output

    @staticmethod
    def print_metrics(results: List[Dict]):
        """ASCII metric table (reference model_wrapper.py:319-371)."""
        header = "| {:>12} | " + " | ".join(f"{n:>8}" for n in METRIC_NAMES) + " |"
        bar = "-" * len(header.format(""))
        for di, res in enumerate(results):
            print(bar)
            print(header.format(f"dataset {di}"))
            print(bar)
            for mode in EVAL_MODES:
                row = "| {:>12} | ".format(mode) + " | ".join(
                    f"{v:8.3f}" for v in res[mode]) + " |"
                print(row)
            print(bar)
