"""AOT export CLI: serialize the compiled depth forward for deployment.

The reference deploys via TensorRT (README.md:17, Dockerfile TRT_VERSION);
the XLA-native equivalent is ``jax.export``: the depth network (params baked
in as constants) is lowered to StableHLO once, serialized, and can be loaded
and executed later — including from a process that never imports this
framework's model code — with compile-once semantics per platform.

    python -m packnet_sfm_tpu.cli.export --checkpoint <ckpt> \
        --output depth_model.jaxexp --image_shape 192 640 [--batch 1] \
        [--half] [--platforms tpu cpu]

Load side:

    import jax.export
    fn = jax.export.deserialize(open(p, 'rb').read()).call
    inv_depth = fn(rgb)   # [B, H, W, 1] f32
"""

from __future__ import annotations

import argparse
import json
import os


def parse_args():
    p = argparse.ArgumentParser(description="PackNet-SfM-TPU AOT export")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--output", type=str, required=True, help=".jaxexp output path")
    p.add_argument("--image_shape", type=int, nargs=2, default=None,
                   help="H W (default: checkpoint's augmentation.image_shape)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--half", action="store_true", help="bf16 compute")
    p.add_argument("--platforms", type=str, nargs="*", default=None,
                   help="lowering platforms, e.g. tpu cpu (default: current)")
    return p.parse_args()


def export_depth_model(model, variables, batch: int, image_shape, path: str,
                       platforms=None) -> bytes:
    """Export model's depth forward (params baked in) to ``path``.

    Returns the serialized bytes. The exported callable maps
    rgb [batch, H, W, 3] f32 -> inverse depth [batch, H, W, 1] f32.
    """
    import jax
    import jax.export
    import jax.numpy as jnp

    from packnet_sfm_tpu.models.sfm import model_forward

    h, w = image_shape

    def forward(rgb):
        out, _ = model_forward(model, variables, {"rgb": rgb}, train=False)
        return out["inv_depths"][0].astype(jnp.float32)

    spec = jax.ShapeDtypeStruct((batch, h, w, 3), jnp.float32)
    exported = jax.export.export(
        jax.jit(forward),
        platforms=platforms)(spec)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return blob


def main():
    args = parse_args()

    from packnet_sfm_tpu.core.config import ConfigNode
    from packnet_sfm_tpu.engine.checkpoint import restore_checkpoint
    from packnet_sfm_tpu.engine.factory import setup_model

    with open(os.path.join(args.checkpoint, "meta.json")) as f:
        meta = json.load(f)
    config = ConfigNode.from_dict(meta["config"])
    import jax.numpy as jnp
    model = setup_model(config.model, dtype=jnp.bfloat16 if args.half else None)
    state, _ = restore_checkpoint(args.checkpoint)
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]

    image_shape = args.image_shape or tuple(
        config.datasets.augmentation.image_shape) or (192, 640)
    blob = export_depth_model(model, variables, args.batch, image_shape,
                              args.output, platforms=args.platforms)
    print(f"### Exported depth forward ({len(blob) / 1e6:.1f} MB) to {args.output}")


if __name__ == "__main__":
    main()
