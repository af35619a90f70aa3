"""Convert a reference (torch) .ckpt into this framework's checkpoint format.

Interop path for users migrating from TRI-ML/packnet-sfm: their released
checkpoints (torch.save dicts with {config, epoch, state_dict, ...},
model_checkpoint.py:69-75) convert into an orbax checkpoint this framework
trains from / evaluates directly. Only the model weights and config carry
over; the optimizer restarts.

    python -m packnet_sfm_tpu.cli.convert_checkpoint \
        --input PackNet01_MR_selfsup_K.ckpt --output ./converted.ckpt
"""

from __future__ import annotations

import argparse

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="reference ckpt -> packnet-sfm-tpu")
    p.add_argument("--input", type=str, required=True,
                   help="torch .ckpt (or torchvision .pth with --imagenet)")
    p.add_argument("--output", type=str, required=True,
                   help="output ckpt dir (or .npz artifact with --imagenet)")
    p.add_argument("--imagenet", action="store_true",
                   help="input is a torchvision ResNet state_dict; emit an "
                        "encoder-weights npz artifact for "
                        "model.*_net.pretrained_path ('18pt' configs)")
    return p.parse_args()


def convert_imagenet_encoder(input_path: str, output_path: str) -> str:
    """torchvision ResNet state_dict (.pth) -> pretrained-encoder npz artifact.

    The artifact initializes '18pt'/'50pt' encoders (reference
    resnet_encoder.py:78-84 ``models.resnet18(pretrained)``) without needing
    torch at train time.
    """
    import torch

    from packnet_sfm_tpu.utils import torch_import as ti

    obj = torch.load(input_path, map_location="cpu", weights_only=False)
    sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj
    sd = ti.state_dict_to_numpy(sd)
    params, stats = ti.resnet_encoder_from_torch(sd, prefix="")
    ti.save_encoder_artifact(output_path, params, stats)
    n = sum(v.size for v in ti._flatten_tree(params).values())
    print(f"converted {n / 1e6:.2f}M encoder params -> {output_path}")
    return output_path


def _strip(sd, prefix):
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def convert(input_path: str, output_path: str) -> str:
    import jax
    import torch

    from packnet_sfm_tpu.core.config import ConfigNode, get_default_config, merge_config
    from packnet_sfm_tpu.engine.checkpoint import save_checkpoint
    from packnet_sfm_tpu.engine.factory import make_optimizer, setup_model
    from packnet_sfm_tpu.engine.train import TrainState
    from packnet_sfm_tpu.models.sfm import init_model
    from packnet_sfm_tpu.utils import torch_import as ti

    ckpt = torch.load(input_path, map_location="cpu", weights_only=False)
    sd = ti.state_dict_to_numpy(ckpt["state_dict"])
    if input_path.endswith(".pth.tar"):
        # Older published model family (reference utils/load.py:136-137):
        # legacy disp_network/pose_network naming -> current model.* naming.
        sd = ti.legacy_state_dict(sd)

    # Recover config: reference ckpts embed a yacs CfgNode; fall back to
    # name-sniffing if absent.
    ref_cfg = ckpt.get("config")
    cfg = get_default_config()
    if ref_cfg is not None:
        try:
            cfg = merge_config(cfg, ConfigNode.from_dict(
                ref_cfg if isinstance(ref_cfg, dict) else dict(ref_cfg)))
        except Exception:
            pass
    depth_name = cfg.model.depth_net.get("name") or ""
    pose_name = cfg.model.pose_net.get("name") or ""
    if not depth_name:
        depth_name = "PackNet01" if any("pack1" in k for k in sd) else "DepthResNet"
        cfg.model.depth_net.name = depth_name
        cfg.model.depth_net.version = "1A" if depth_name == "PackNet01" else "18"
    if not cfg.model.get("name"):
        cfg.model.name = "SelfSupModel"

    depth_sd = _strip(sd, "model.depth_net.")
    pose_sd = _strip(sd, "model.pose_net.")

    params = {}
    stats = {}
    if depth_name in ("PackNet01", "PackNetSlim01"):
        params["depth_net"] = ti.packnet_from_torch(depth_sd)
    elif depth_name == "DepthResNet":
        p, s = ti.depth_resnet_from_torch(depth_sd)
        params["depth_net"], stats["depth_net"] = p, s
    else:
        raise ValueError(f"Unsupported depth net for conversion: {depth_name}")
    if pose_sd:
        if pose_name in ("PoseNet", ""):
            params["pose_net"] = ti.posenet_from_torch(pose_sd)
        elif pose_name == "PoseResNet":
            p, s = ti.pose_resnet_from_torch(pose_sd)
            params["pose_net"], stats["pose_net"] = p, s
        else:
            raise ValueError(f"Unsupported pose net for conversion: {pose_name}")

    # Build a full TrainState around the converted weights so the output is a
    # normal resumable checkpoint. Optimizer state is fresh.
    model = setup_model(cfg.model)
    h, w = tuple(cfg.datasets.augmentation.get("image_shape") or (192, 640))
    sample = {
        "rgb": np.zeros((1, h, w, 3), np.float32),
        "rgb_context": [np.zeros((1, h, w, 3), np.float32)] * 2,
        "intrinsics": np.broadcast_to(np.eye(3, dtype=np.float32), (1, 3, 3)).copy(),
    }
    variables = init_model(model, jax.random.PRNGKey(0), sample)

    def check_tree(name, init_tree, new_tree):
        init_leaves = jax.tree_util.tree_leaves(init_tree)
        new_leaves = jax.tree_util.tree_leaves(new_tree)
        assert len(init_leaves) == len(new_leaves), \
            f"{name}: converted {len(new_leaves)} tensors, model has {len(init_leaves)}"

    for net, tree in params.items():
        check_tree(net, variables["params"][net], tree)
        variables["params"][net] = jax.tree_util.tree_map(np.asarray, tree)
    if stats:
        variables.setdefault("batch_stats", {})
        for net, tree in stats.items():
            variables["batch_stats"][net] = jax.tree_util.tree_map(np.asarray, tree)

    tx = make_optimizer(cfg.model.optimizer, cfg.model.scheduler, 1000)
    state = TrainState.create(variables, tx)
    path = save_checkpoint(output_path, state, cfg.to_dict(),
                           epoch=int(ckpt.get("epoch", 0)))
    n = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    print(f"converted {n / 1e6:.2f}M params -> {path}")
    return path


def main():
    a = parse_args()
    if a.imagenet:
        convert_imagenet_encoder(a.input, a.output)
    else:
        convert(a.input, a.output)


if __name__ == "__main__":
    main()
