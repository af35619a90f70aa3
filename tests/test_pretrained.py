"""ImageNet-pretrained encoder wiring: '18pt' versions load converted
torchvision weights (reference resnet_encoder.py:78-97).

torchvision itself is not installed here, so the test synthesizes a
torchvision-layout resnet18 state_dict, converts it with the CLI converter,
and verifies exact-weight grafting into DepthResNet/PoseResNet at init
(conv1 widened /2 for the 2-frame pose encoder, resnet_encoder.py:41-58).
"""

import numpy as np
import pytest

from packnet_sfm_tpu.core.config import get_default_config, parse_train_config


def torchvision_resnet18_sd(rng):
    """Random weights in torchvision resnet18 state_dict layout."""
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.normal(
            size=(o, i, k, k)).astype(np.float32) * 0.05

    def bn(name, c):
        sd[f"{name}.weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.bias"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[f"{name}.running_mean"] = rng.normal(size=c).astype(np.float32) * 0.1
        sd[f"{name}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[f"{name}.num_batches_tracked"] = np.asarray(100)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    cin = 64
    for li, width in enumerate((64, 128, 256, 512), start=1):
        for b in range(2):
            base = f"layer{li}.{b}"
            c_in = cin if b == 0 else width
            conv(f"{base}.conv1", width, c_in, 3)
            bn(f"{base}.bn1", width)
            conv(f"{base}.conv2", width, width, 3)
            bn(f"{base}.bn2", width)
            if b == 0 and li > 1:
                conv(f"{base}.downsample.0", width, c_in, 1)
                bn(f"{base}.downsample.1", width)
        cin = width
    # classifier head, ignored by the encoder converter
    sd["fc.weight"] = rng.normal(size=(1000, 512)).astype(np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)
    return sd


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    from packnet_sfm_tpu.utils import torch_import as ti

    rng = np.random.default_rng(3)
    sd = torchvision_resnet18_sd(rng)
    path = str(tmp_path_factory.mktemp("pre") / "resnet18.npz")
    params, stats = ti.resnet_encoder_from_torch(sd, prefix="")
    ti.save_encoder_artifact(path, params, stats)
    return path, sd


def pretrained_config(artifact_path):
    c = get_default_config()
    c.arch.max_epochs = 1
    c.model.name = "SelfSupModel"
    c.model.depth_net.name = "DepthResNet"
    c.model.depth_net.version = "18pt"
    c.model.depth_net.pretrained_path = artifact_path
    c.model.pose_net.name = "PoseResNet"
    c.model.pose_net.version = "18pt"
    c.model.pose_net.pretrained_path = artifact_path
    c.model.loss.flip_lr_prob = 0.0
    for mode in ("train", "validation", "test"):
        d = c.datasets[mode]
        d.dataset = ["Synthetic"]
        d.path = [""]
        d.split = [""]
        d.depth_type = [""]
        d.batch_size = 8
        d.num_workers = 1
        d.synthetic_length = 8
        d.synthetic_height = 32
        d.synthetic_width = 64
    return parse_train_config(c)


def test_artifact_roundtrip(artifact):
    from packnet_sfm_tpu.utils import torch_import as ti

    path, sd = artifact
    params, stats = ti.load_encoder_artifact(path)
    # conv1: torch [O,I,kh,kw] -> flax [kh,kw,I,O]
    np.testing.assert_array_equal(
        params["conv1"]["kernel"], sd["conv1.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        stats["bn1"]["BatchNorm_0"]["var"], sd["bn1.running_var"])
    np.testing.assert_array_equal(
        params["layer2_0"]["downsample_conv"]["kernel"],
        sd["layer2.0.downsample.0.weight"].transpose(2, 3, 1, 0))


def test_trainer_inits_pretrained_encoders(artifact):
    from packnet_sfm_tpu.engine.trainer import Trainer

    path, sd = artifact
    cfg = pretrained_config(path)
    t = Trainer(cfg)
    first = next(iter(t.train_loaders[0].epoch(0)))
    t.init_state(first)
    params = t.state.params
    stats = t.state.batch_stats

    # depth encoder: exact weights
    got = np.asarray(params["depth_net"]["encoder"]["conv1"]["kernel"])
    want = sd["conv1.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, atol=1e-7)
    got_var = np.asarray(
        stats["depth_net"]["encoder"]["bn1"]["BatchNorm_0"]["var"])
    np.testing.assert_allclose(got_var, sd["bn1.running_var"], atol=1e-7)

    # pose encoder: conv1 widened to 6 input channels, halved
    got_pose = np.asarray(params["pose_net"]["encoder"]["conv1"]["kernel"])
    assert got_pose.shape[2] == 6
    np.testing.assert_allclose(got_pose[:, :, :3], want / 2, atol=1e-7)
    np.testing.assert_allclose(got_pose[:, :, 3:], want / 2, atol=1e-7)

    # deeper layer also grafted
    got_l4 = np.asarray(
        params["depth_net"]["encoder"]["layer4_1"]["conv2"]["kernel"])
    np.testing.assert_allclose(
        got_l4, sd["layer4.1.conv2.weight"].transpose(2, 3, 1, 0), atol=1e-7)


def test_cli_imagenet_conversion(tmp_path, artifact):
    """argv-level --imagenet converter path (needs torch to read the .pth)."""
    torch = pytest.importorskip("torch")
    import sys
    from unittest import mock

    from packnet_sfm_tpu.cli import convert_checkpoint as cc

    _, sd = artifact
    pth = str(tmp_path / "resnet18.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, pth)
    out = str(tmp_path / "enc.npz")
    with mock.patch.object(sys, "argv", ["convert_checkpoint",
                                         "--input", pth, "--output", out,
                                         "--imagenet"]):
        cc.main()
    from packnet_sfm_tpu.utils.torch_import import load_encoder_artifact
    params, _ = load_encoder_artifact(out)
    np.testing.assert_array_equal(
        params["conv1"]["kernel"], sd["conv1.weight"].transpose(2, 3, 1, 0))


def test_missing_artifact_warns_not_crashes(tmp_path, capsys):
    from packnet_sfm_tpu.engine.trainer import Trainer

    cfg = pretrained_config("")  # no pretrained_path, no $PN_PRETRAINED_DIR
    cfg.model.depth_net.pretrained_path = ""
    cfg.model.pose_net.pretrained_path = ""
    t = Trainer(cfg)
    first = next(iter(t.train_loaders[0].epoch(0)))
    t.init_state(first)
    assert "training from scratch" in capsys.readouterr().out
