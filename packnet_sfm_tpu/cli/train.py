"""Train CLI: ``python -m packnet_sfm_tpu.cli.train <config.yaml | ckpt dir>``.

Capability parity with reference scripts/train.py: a single positional arg
that is either a fresh yaml config or a checkpoint to resume (its embedded
config is restored). Multi-host: run one process per host with
JAX_COORDINATOR/... env and pass --distributed.
"""

from __future__ import annotations

import argparse
import os

import jax


def parse_args():
    parser = argparse.ArgumentParser(description="PackNet-SfM-TPU training")
    parser.add_argument("file", type=str,
                        help="yaml config for a fresh run, or .ckpt dir to resume")
    parser.add_argument("--distributed", action="store_true",
                        help="call jax.distributed.initialize() (multi-host)")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="write a jax profiler trace for epoch 1")
    args = parser.parse_args()
    assert args.file.endswith((".ckpt", ".yaml")) or os.path.isdir(args.file), \
        "must provide a .yaml config or checkpoint dir"
    return args


def train(file: str, distributed: bool = False, profile_dir=None):
    if distributed:
        jax.distributed.initialize()

    from packnet_sfm_tpu.core.config import ConfigNode, parse_train_config
    from packnet_sfm_tpu.engine.checkpoint import restore_checkpoint
    from packnet_sfm_tpu.engine.trainer import Trainer

    resume_path = None
    if os.path.isdir(file) or file.endswith(".ckpt"):
        import json
        with open(os.path.join(file, "meta.json")) as f:
            meta = json.load(f)
        config = parse_train_config(ConfigNode.from_dict(meta["config"]))
        resume_path = file
    else:
        config = parse_train_config(file)

    trainer = Trainer(config, profile_dir=profile_dir)
    if resume_path:
        trainer.resume(resume_path)
    trainer.fit()


def main():
    args = parse_args()
    train(args.file, args.distributed, args.profile_dir)


if __name__ == "__main__":
    main()
