"""Inference CLI: single image or folder -> inverse depth maps.

Capability parity with reference scripts/infer.py: loads a checkpoint, runs
the depth net only, saves npz/png depth and/or an rgb+viz side-by-side
image. Files are sharded across hosts ``files[process_index::process_count]``
(reference infer.py:153).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def parse_args():
    parser = argparse.ArgumentParser(description="PackNet-SfM-TPU inference")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--input", type=str, required=True, help="image or folder")
    parser.add_argument("--output", type=str, required=True, help="output file or folder")
    parser.add_argument("--image_shape", type=int, nargs=2, default=None)
    parser.add_argument("--half", action="store_true")
    parser.add_argument("--save", type=str, choices=["npz", "png"], default=None,
                        help="save depth as npz/png instead of rgb+viz image")
    return parser.parse_args()


def infer_and_save(checkpoint, inp, out, image_shape=None, half=False, save=None):
    import jax
    import jax.numpy as jnp

    from packnet_sfm_tpu.core.config import ConfigNode
    from packnet_sfm_tpu.datasets.augmentations import resize_image
    from packnet_sfm_tpu.datasets.kitti import load_image
    from packnet_sfm_tpu.engine.checkpoint import restore_checkpoint
    from packnet_sfm_tpu.engine.factory import setup_model
    from packnet_sfm_tpu.models.sfm import model_forward
    from packnet_sfm_tpu.utils.viz import viz_inv_depth
    from packnet_sfm_tpu.utils.save import write_depth

    with open(os.path.join(checkpoint, "meta.json")) as f:
        meta = json.load(f)
    config = ConfigNode.from_dict(meta["config"])
    model = setup_model(config.model)
    state, _ = restore_checkpoint(checkpoint)
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]

    if image_shape is None:
        image_shape = tuple(config.datasets.augmentation.image_shape) or None

    exts = (".png", ".jpg", ".jpeg")
    if os.path.isdir(inp):
        files = sorted(os.path.join(inp, f) for f in os.listdir(inp)
                       if f.lower().endswith(exts))
        os.makedirs(out, exist_ok=True)
        outs = [os.path.join(out, os.path.basename(f)) for f in files]
    else:
        files, outs = [inp], [out]
    files = files[jax.process_index()::jax.process_count()]
    outs = outs[jax.process_index()::jax.process_count()]

    dtype = jnp.bfloat16 if half else jnp.float32

    # variables is an ARGUMENT, not a closure: closed-over params would be
    # baked into the compiled graph as constants — 100s of MB of HLO that
    # the tunneled remote-compile service rejects (HTTP 413) for the larger
    # PackNet models, and a cache miss on every weight change.
    @jax.jit
    def depth_only(variables, rgb):
        o, _ = model_forward(model, variables, {"rgb": rgb}, train=False)
        return o["inv_depths"][0].astype(jnp.float32)

    for f, o in zip(files, outs):
        rgb = load_image(f)
        if image_shape is not None:
            rgb = resize_image(rgb, image_shape)
        inv_depth = np.asarray(
            depth_only(variables, jnp.asarray(rgb[None]).astype(dtype)))[0]
        if save == "npz" or save == "png":
            write_depth(os.path.splitext(o)[0] + "." + save,
                        1.0 / np.clip(inv_depth[..., 0], 1e-6, None))
        else:
            viz = viz_inv_depth(inv_depth[..., 0])
            side = np.concatenate([rgb, viz], axis=0)
            from PIL import Image
            Image.fromarray((side * 255).astype(np.uint8)).save(
                os.path.splitext(o)[0] + ".png")
        print(f"{f} -> {o}")


def main():
    a = parse_args()
    infer_and_save(a.checkpoint, a.input, a.output, a.image_shape, a.half, a.save)


if __name__ == "__main__":
    main()
