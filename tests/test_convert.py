"""Checkpoint conversion test: fabricate a reference-format torch .ckpt,
convert it, and verify the converted model reproduces the torch forward."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.parametrize("nets", [("PackNet01", "PoseNet")])
def test_reference_ckpt_roundtrip(tmp_path, nets):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from packnet_sfm.networks.depth.PackNet01 import PackNet01 as RefPackNet
        from packnet_sfm.networks.pose.PoseNet import PoseNet as RefPoseNet
    finally:
        sys.path.remove("/root/reference")

    depth = RefPackNet(version="1A")
    pose = RefPoseNet(nb_ref_imgs=2)
    state_dict = {}
    for k, v in depth.state_dict().items():
        state_dict[f"model.depth_net.{k}"] = v
    for k, v in pose.state_dict().items():
        state_dict[f"model.pose_net.{k}"] = v

    ckpt_path = str(tmp_path / "ref.ckpt")
    torch.save({
        "config": {"model": {"name": "SelfSupModel",
                             "depth_net": {"name": "PackNet01", "version": "1A"},
                             "pose_net": {"name": "PoseNet", "version": ""}},
                   "datasets": {"augmentation": {"image_shape": (64, 96)}}},
        "epoch": 7,
        "state_dict": state_dict,
    }, ckpt_path)

    from packnet_sfm_tpu.cli.convert_checkpoint import convert
    out_dir = str(tmp_path / "converted.ckpt")
    convert(ckpt_path, out_dir)

    # Load back and compare the depth forward against torch.
    from packnet_sfm_tpu.core.config import ConfigNode
    from packnet_sfm_tpu.engine.checkpoint import restore_checkpoint
    from packnet_sfm_tpu.engine.factory import setup_model
    from packnet_sfm_tpu.models.sfm import model_forward
    import json
    import os

    state = restore_checkpoint(out_dir)[0]
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["epoch"] == 7
    model = setup_model(ConfigNode.from_dict(meta["config"])["model"])

    rng = np.random.default_rng(0)
    x = rng.uniform(size=(1, 64, 96, 3)).astype(np.float32)
    out, _ = model_forward(
        model, {"params": state["params"]}, {"rgb": jnp.asarray(x)}, train=False)
    depth.train()
    with torch.no_grad():
        theirs = depth(torch.from_numpy(x.transpose(0, 3, 1, 2)))["inv_depths"][0]
    np.testing.assert_allclose(
        np.asarray(out["inv_depths"][0]),
        theirs.numpy().transpose(0, 2, 3, 1), atol=5e-5)


def test_legacy_pth_tar_roundtrip(tmp_path):
    """Older published ``.pth.tar`` models use legacy net names
    (``disp_network``/``pose_network``, Sequential-wrapped shortcut convs —
    reference utils/load.py:166-198). Fabricate one and verify the converter
    lands the same weights as a current-named .ckpt."""
    torch = pytest.importorskip("torch")
    sys.path.insert(0, "/root/reference")
    try:
        from packnet_sfm.networks.depth.PackNet01 import PackNet01 as RefPackNet
        from packnet_sfm.networks.pose.PoseNet import PoseNet as RefPoseNet
    finally:
        sys.path.remove("/root/reference")

    depth = RefPackNet(version="1A")
    pose = RefPoseNet(nb_ref_imgs=2)
    legacy = {}
    for k, v in depth.state_dict().items():
        # Invert the backwards rename: bare conv3 -> Sequential conv3.0
        lk = k.replace("conv3.weight", "conv3.0.weight") \
              .replace("conv3.bias", "conv3.0.bias")
        legacy[f"disp_network.{lk}"] = v
    for k, v in pose.state_dict().items():
        legacy[f"pose_network.{k}"] = v

    ckpt_path = str(tmp_path / "legacy.pth.tar")
    torch.save({
        "config": {"model": {"name": "SelfSupModel",
                             "depth_net": {"name": "PackNet01", "version": "1A"},
                             "pose_net": {"name": "PoseNet", "version": ""}},
                   "datasets": {"augmentation": {"image_shape": (64, 96)}}},
        "state_dict": legacy,
    }, ckpt_path)

    from packnet_sfm_tpu.cli.convert_checkpoint import convert
    out_dir = str(tmp_path / "converted_legacy.ckpt")
    convert(ckpt_path, out_dir)

    from packnet_sfm_tpu.engine.checkpoint import restore_checkpoint
    from packnet_sfm_tpu.utils import torch_import as ti
    state = restore_checkpoint(out_dir)[0]

    want_depth = ti.packnet_from_torch(ti.state_dict_to_numpy(depth.state_dict()))
    want_pose = ti.posenet_from_torch(ti.state_dict_to_numpy(pose.state_dict()))
    got = state["params"]
    for want, net in ((want_depth, "depth_net"), (want_pose, "pose_net")):
        flat_want = ti._flatten_tree(want)
        flat_got = ti._flatten_tree(jax.tree_util.tree_map(np.asarray, got[net]))
        assert set(flat_want) == set(flat_got)
        for k in flat_want:
            np.testing.assert_array_equal(flat_want[k], flat_got[k])
