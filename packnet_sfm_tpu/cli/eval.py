"""Eval CLI: ``python -m packnet_sfm_tpu.cli.eval --checkpoint <ckpt dir>``.

Capability parity with reference scripts/eval.py: restores a checkpoint
(+optional yaml config override), runs the test loop, prints metric tables.
``--half`` evaluates in bfloat16 (the TPU analogue of the reference's fp16).
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args():
    parser = argparse.ArgumentParser(description="PackNet-SfM-TPU evaluation")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--config", type=str, default=None,
                        help="optional yaml overriding the embedded config")
    parser.add_argument("--half", action="store_true",
                        help="evaluate with bfloat16 compute")
    return parser.parse_args()


def evaluate(checkpoint: str, config_path=None, half=False):
    from packnet_sfm_tpu.core.config import (
        ConfigNode, load_config, merge_config, parse_train_config)
    from packnet_sfm_tpu.engine.trainer import Trainer

    with open(os.path.join(checkpoint, "meta.json")) as f:
        meta = json.load(f)
    config = ConfigNode.from_dict(meta["config"])
    if config_path:
        config = merge_config(config, load_config(config_path).to_dict())
    if half:
        config.arch.dtype = "bfloat16"
    config = parse_train_config(config)

    trainer = Trainer(config)
    trainer.resume(checkpoint)
    return trainer.test()


def main():
    args = parse_args()
    evaluate(args.checkpoint, args.config, args.half)


if __name__ == "__main__":
    main()
