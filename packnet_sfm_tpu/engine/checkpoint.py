"""Checkpointing: orbax-backed save/restore with embedded config and top-k
retention.

Capability parity with reference models/model_checkpoint.py: monitored-metric
ranking with auto min/max direction ('a1'/'acc' -> max, model_checkpoint.py:
44-54), top-k retention, epoch-templated names, and full-state restoration
(config + epoch + params + optimizer + scheduler state — the schedule here is
a pure function of step, so restoring ``step`` restores it exactly).
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _mode_for(monitor: str, mode: str) -> str:
    if mode != "auto":
        return mode
    return "max" if ("a1" in monitor or "acc" in monitor) else "min"


class ModelCheckpoint:
    """Top-k checkpoint manager keyed on a monitored metric."""

    def __init__(self, dirpath: str, monitor: str = "loss", save_top_k: int = 5,
                 mode: str = "auto", s3_path: str = "", s3_frequency: int = 1):
        self.dirpath = os.path.abspath(dirpath)
        os.makedirs(self.dirpath, exist_ok=True)
        self.monitor = monitor
        self.save_top_k = save_top_k
        self.mode = _mode_for(monitor, mode)
        self.s3_path = s3_path
        self.s3_frequency = s3_frequency
        self._saves = 0
        self._saved: list[tuple[float, str]] = []
        self._ckpt = ocp.StandardCheckpointer()

    def _save_code_tarball(self):
        """One-time source snapshot next to the checkpoints (reference
        model_checkpoint.py:78-92 ``save_code``: tars the repo so every
        synced run carries the exact code that produced it)."""
        tar_path = os.path.join(self.dirpath, "code.tar.gz")
        if os.path.exists(tar_path):
            return
        import tarfile

        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        try:
            with tarfile.open(tar_path, "w:gz") as tar:
                tar.add(pkg_root, arcname=os.path.basename(pkg_root),
                        filter=lambda ti: None if "__pycache__" in ti.name
                        else ti)
        except OSError as e:
            print(f"code tarball failed: {e}")

    def _s3_sync(self):
        """Off-site sync via the aws CLI when configured
        (reference model_checkpoint.py:78-92); silent no-op otherwise."""
        if not self.s3_path:
            return
        self._save_code_tarball()
        import subprocess
        try:
            subprocess.run(
                ["aws", "s3", "sync", self.dirpath, self.s3_path,
                 "--quiet", "--delete"],
                check=False, timeout=600)
        except (OSError, subprocess.SubprocessError) as e:
            print(f"s3 sync failed: {e}")

    def _is_better(self, value: float, worst: float) -> bool:
        return value > worst if self.mode == "max" else value < worst

    def check_and_save(self, state, config: Dict, epoch: int,
                       metrics: Dict[str, float]) -> Optional[str]:
        """Save if within top-k by the monitored metric; returns path or None.

        Parity: reference model_checkpoint.py:94-130 (``check_and_save``).
        """
        value = float(metrics.get(self.monitor, metrics.get("loss", 0.0)))
        if self.save_top_k > 0 and len(self._saved) >= self.save_top_k:
            worst = self._saved[-1][0]
            if not self._is_better(value, worst):
                return None
        name = f"epoch={epoch:02d}_{self.monitor.replace('/', '-')}={value:.3f}.ckpt"
        path = os.path.join(self.dirpath, name)
        # All processes enter (metrics are globally reduced, so the top-k
        # decision is identical everywhere); save_checkpoint guards the
        # filesystem writes to rank 0 and coordinates orbax's barriers.
        save_checkpoint(path, state, config, epoch, value)
        self._saved.append((value, path))
        self._saved.sort(key=lambda kv: kv[0], reverse=(self.mode == "max"))
        while self.save_top_k > 0 and len(self._saved) > self.save_top_k:
            _, old = self._saved.pop()
            if jax.process_index() == 0:
                shutil.rmtree(old, ignore_errors=True)
        self._saves += 1
        if (self.s3_path and jax.process_index() == 0
                and self._saves % max(self.s3_frequency, 1) == 0):
            self._s3_sync()
        return path


def save_checkpoint(path: str, state, config: Dict, epoch: int,
                    monitor_value: float = 0.0) -> str:
    """Write a checkpoint directory: orbax state + meta.json (embedded config,
    reference utils/config.py:216-220 capability).

    Multi-process: EVERY process must call this (orbax synchronizes all
    processes internally during save — a rank-0-only call hangs in that
    barrier while the other ranks exit; caught by the distributed
    preemption test). Filesystem mutations happen on process 0 only.
    """
    path = os.path.abspath(path)
    primary = jax.process_index() == 0
    if primary and os.path.exists(path):
        shutil.rmtree(path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        # the rmtree must land before any process lets orbax recreate it
        multihost_utils.sync_global_devices(f"pn_ckpt_pre_save:{path}")
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.join(path, "state"), jax.device_get(state))
    ckpt.wait_until_finished()
    if primary:
        meta = {"config": config, "epoch": epoch,
                "monitor_value": monitor_value,
                "step": int(jax.device_get(state.step))}
        with open(os.path.join(path, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)
    return path


def load_network(path: str, variables: Dict, network: str) -> Dict:
    """Load one sub-network's params from a checkpoint into ``variables``.

    Capability parity with reference utils/load.py:114 (``load_network``):
    prefix-matched partial loads tolerate missing/mismatched entries and
    report the match count. ``network`` is 'depth_net' or 'pose_net'
    (config keys model.depth_net.checkpoint_path etc.,
    model_wrapper.py:405-407).
    """
    import numpy as np

    state = ocp.StandardCheckpointer().restore(
        os.path.join(os.path.abspath(path), "state"))
    loaded_params = state["params"].get(network, {})

    def count_leaves(t):
        return len(jax.tree_util.tree_leaves(t))

    updated = dict(variables)
    n_total = count_leaves(variables["params"].get(network, {}))
    n_loaded = 0

    def merge(dst, src):
        nonlocal n_loaded
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                continue
            if isinstance(v, dict):
                out[k] = merge(dst[k], v)
            elif np.shape(dst[k]) == np.shape(v):
                out[k] = v
                n_loaded += 1
        return out

    params = dict(updated["params"])
    params[network] = merge(params.get(network, {}), loaded_params)
    updated["params"] = params
    if "batch_stats" in state and state["batch_stats"] and \
            network in state["batch_stats"] and "batch_stats" in updated:
        stats = dict(updated["batch_stats"])
        stats[network] = merge(stats.get(network, {}), state["batch_stats"][network])
        updated["batch_stats"] = stats
    print(f"### Loaded {n_loaded}/{n_total} tensors for {network} from {path}")
    return updated


def restore_checkpoint(path: str, target_state=None):
    """Restore (state, meta). With ``target_state`` the pytree structure and
    shardings of the target are reused (required under jit/mesh)."""
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    if target_state is not None:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target_state)
        state = ckpt.restore(os.path.join(path, "state"), abstract)
    else:
        state = ckpt.restore(os.path.join(path, "state"))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    return state, meta


def load_pretrained_encoder(artifact_path: str, variables: Dict, network: str,
                            num_input_images: int = 1) -> Dict:
    """Graft ImageNet-pretrained ResNet encoder weights into ``variables``.

    Parity with reference resnet_encoder.py:78-97 (``models.resnet18(
    pretrained)`` + ``resnet_multiimage_input``): configs with version
    '18pt'/'50pt' initialize the encoder from converted torchvision weights
    (an npz artifact produced offline by cli/convert_checkpoint.py
    --imagenet). ``num_input_images`` widens conv1 for PoseResNet's stacked
    frames.
    """
    import numpy as np

    from packnet_sfm_tpu.utils.torch_import import (
        adapt_conv1_multiimage,
        load_encoder_artifact,
    )

    enc_params, enc_stats = load_encoder_artifact(artifact_path)
    if num_input_images > 1 and "conv1" in enc_params:
        enc_params["conv1"]["kernel"] = adapt_conv1_multiimage(
            enc_params["conv1"]["kernel"], num_input_images)

    n_loaded = 0

    def merge(dst, src, where):
        nonlocal n_loaded
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"pretrained artifact key {where}/{k} not in model")
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, f"{where}/{k}")
            else:
                if np.shape(dst[k]) != np.shape(v):
                    raise ValueError(
                        f"pretrained shape mismatch at {where}/{k}: "
                        f"{np.shape(v)} vs model {np.shape(dst[k])}")
                out[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)
                n_loaded += 1
        return out

    updated = dict(variables)
    params = dict(updated["params"])
    net_params = dict(params[network])
    net_params["encoder"] = merge(net_params["encoder"], enc_params,
                                  f"{network}/encoder")
    params[network] = net_params
    updated["params"] = params
    if enc_stats and "batch_stats" in updated:
        stats = dict(updated["batch_stats"])
        net_stats = dict(stats.get(network, {}))
        net_stats["encoder"] = merge(net_stats.get("encoder", {}), enc_stats,
                                     f"{network}/encoder(stats)")
        stats[network] = net_stats
        updated["batch_stats"] = stats
    print(f"### Loaded {n_loaded} pretrained encoder tensors for {network} "
          f"from {artifact_path}")
    return updated
