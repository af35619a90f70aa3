"""Offline torch->flax weight conversion.

Capability parity with the reference's checkpoint interop (utils/load.py:114
``load_network``): lets a user bring reference-trained PackNet / PoseNet /
DepthResNet / PoseResNet weights (or torchvision ImageNet encoders) into this
framework. Operates on plain ``{name: np.ndarray}`` state dicts, so torch is
only needed to *read* .ckpt/.pth files, not at train time.

Layout conversions:
- torch Conv2d [O, I, kh, kw]      -> flax [kh, kw, I, O]
- torch Conv3d [O, I, kd, kh, kw]  -> flax [kd, kh, kw, I, O]
- GroupNorm/BatchNorm weight/bias  -> scale/bias
"""

from __future__ import annotations

import re
from typing import Dict, Mapping, Tuple

import numpy as np


def _c2d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _c3d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 4, 1, 0))


def _set(tree: Dict, path: Tuple[str, ...], leaf_name: str, value: np.ndarray):
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf_name] = value


def state_dict_to_numpy(state_dict: Mapping) -> Dict[str, np.ndarray]:
    """Detach a torch state_dict into numpy.

    COPIES: ``.numpy()`` alone returns a view of the live tensor storage, so
    a torch optimizer stepping in place would silently mutate the "converted"
    weights (this bit the lockstep-parity harness). Conversion is offline;
    one extra copy is cheap insurance.
    """
    out = {}
    for k, v in state_dict.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else v
        out[k] = np.array(arr, copy=True)
    return out


def legacy_state_dict(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rename keys of an old published ``.pth.tar`` state dict to the current
    reference naming, so the rest of the conversion pipeline applies.

    Capability parity with reference ``backwards_state_dict``
    (utils/load.py:166-198): the legacy generation named the nets
    ``disp_network`` / ``pose_network`` (without the ``model.`` wrapper) and
    wrapped the packnet residual-shortcut conv in a Sequential
    (``conv3.0.*``). Current naming is ``model.depth_net.*`` /
    ``model.pose_net.*`` with a bare ``conv3``.
    """
    out: Dict[str, np.ndarray] = {}
    for key, val in sd.items():
        key = f"model.{key}"
        if "disp_network" in key:
            key = key.replace("conv3.0.weight", "conv3.weight")
            key = key.replace("conv3.0.bias", "conv3.bias")
        for old, new in (("model.model.", "model."),
                         ("pose_network.", "pose_net."),
                         ("disp_network.", "depth_net.")):
            key = key.replace(old, new)
        out[key] = val
    return out


def _convert_conv2d_block(sd, prefix: str, params: Dict, path: Tuple[str, ...]):
    """reference Conv2D (conv_base + normalize) -> our Conv2dBlock."""
    _set(params, path + ("Conv_0",), "kernel", _c2d(sd[f"{prefix}.conv_base.weight"]))
    _set(params, path + ("Conv_0",), "bias", sd[f"{prefix}.conv_base.bias"])
    _set(params, path + ("GroupNorm_0",), "scale", sd[f"{prefix}.normalize.weight"])
    _set(params, path + ("GroupNorm_0",), "bias", sd[f"{prefix}.normalize.bias"])


def packnet_from_torch(sd: Mapping[str, np.ndarray]) -> Dict:
    """Map a reference PackNet01/PackNetSlim01 state_dict to our param tree.

    Key layout documented in networks/depth/PackNet01.py:56-94 and
    layers01.py. Supports the optional dropout wrapper on residual shortcuts
    (layers01.py:64-65 turns ``conv3`` into ``conv3.0``).
    """
    params: Dict = {}
    _convert_conv2d_block(sd, "pre_calc", params, ("pre_calc",))
    _convert_conv2d_block(sd, "conv1", params, ("conv1",))

    # Residual stacks conv2..conv5 (nn.Sequential of ResidualConv)
    for n in range(2, 6):
        i = 0
        while f"conv{n}.{i}.conv1.conv_base.weight" in sd:
            base = f"conv{n}.{i}"
            path = (f"conv{n}", f"ResidualConv_{i}")
            _convert_conv2d_block(sd, f"{base}.conv1", params, path + ("Conv2dBlock_0",))
            _convert_conv2d_block(sd, f"{base}.conv2", params, path + ("Conv2dBlock_1",))
            sc = f"{base}.conv3.0" if f"{base}.conv3.0.weight" in sd else f"{base}.conv3"
            _set(params, path + ("Conv_0",), "kernel", _c2d(sd[f"{sc}.weight"]))
            _set(params, path + ("Conv_0",), "bias", sd[f"{sc}.bias"])
            _set(params, path + ("GroupNorm_0",), "scale", sd[f"{base}.normalize.weight"])
            _set(params, path + ("GroupNorm_0",), "bias", sd[f"{base}.normalize.bias"])
            i += 1

    # Pack / unpack stages
    for n in range(1, 6):
        _set(params, (f"pack{n}", "Conv_0"), "kernel", _c3d(sd[f"pack{n}.conv3d.weight"]))
        _set(params, (f"pack{n}", "Conv_0"), "bias", sd[f"pack{n}.conv3d.bias"])
        _convert_conv2d_block(sd, f"pack{n}.conv", params, (f"pack{n}", "Conv2dBlock_0"))
        _set(params, (f"unpack{n}", "Conv_0"), "kernel", _c3d(sd[f"unpack{n}.conv3d.weight"]))
        _set(params, (f"unpack{n}", "Conv_0"), "bias", sd[f"unpack{n}.conv3d.bias"])
        _convert_conv2d_block(sd, f"unpack{n}.conv", params, (f"unpack{n}", "Conv2dBlock_0"))
        _convert_conv2d_block(sd, f"iconv{n}", params, (f"iconv{n}",))

    for n in range(1, 5):
        _set(params, (f"disp{n}", "Conv_0"), "kernel", _c2d(sd[f"disp{n}_layer.conv1.weight"]))
        _set(params, (f"disp{n}", "Conv_0"), "bias", sd[f"disp{n}_layer.conv1.bias"])
    return params


def posenet_from_torch(sd: Mapping[str, np.ndarray]) -> Dict:
    """Map a reference PoseNet state_dict (PoseNet.py:44-65) to our tree."""
    params: Dict = {}
    for i in range(1, 8):
        _set(params, (f"conv{i}", "Conv_0"), "kernel", _c2d(sd[f"conv{i}.0.weight"]))
        _set(params, (f"conv{i}", "Conv_0"), "bias", sd[f"conv{i}.0.bias"])
        _set(params, (f"conv{i}", "GroupNorm_0"), "scale", sd[f"conv{i}.1.weight"])
        _set(params, (f"conv{i}", "GroupNorm_0"), "bias", sd[f"conv{i}.1.bias"])
    _set(params, ("pose_pred",), "kernel", _c2d(sd["pose_pred.weight"]))
    _set(params, ("pose_pred",), "bias", sd["pose_pred.bias"])
    return params


def _convert_bn(sd, prefix: str, params: Dict, stats: Dict, path: Tuple[str, ...]):
    _set(params, path, "scale", sd[f"{prefix}.weight"])
    _set(params, path, "bias", sd[f"{prefix}.bias"])
    _set(stats, path, "mean", sd[f"{prefix}.running_mean"])
    _set(stats, path, "var", sd[f"{prefix}.running_var"])


def resnet_encoder_from_torch(
    sd: Mapping[str, np.ndarray], prefix: str = "encoder."
) -> Tuple[Dict, Dict]:
    """Map a torchvision ResNet state_dict to our ResNetEncoder.

    Returns (params, batch_stats). ``prefix`` strips e.g. the reference's
    ``encoder.encoder.`` nesting (resnet_encoder.py:84).
    """
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: Dict = {}
    stats: Dict = {}
    _set(params, ("conv1",), "kernel", _c2d(sd["conv1.weight"]))
    _convert_bn(sd, "bn1", params, stats, ("bn1", "BatchNorm_0"))
    pat = re.compile(r"layer(\d)\.(\d+)\.conv1\.weight")
    blocks = sorted({(int(m.group(1)), int(m.group(2)))
                     for k in sd if (m := pat.match(k))})
    for l, b in blocks:
        base = f"layer{l}.{b}"
        path = (f"layer{l}_{b}",)
        for ci in (1, 2, 3):
            if f"{base}.conv{ci}.weight" not in sd:
                continue
            _set(params, path + (f"conv{ci}",), "kernel", _c2d(sd[f"{base}.conv{ci}.weight"]))
            _convert_bn(sd, f"{base}.bn{ci}", params, stats, path + (f"bn{ci}", "BatchNorm_0"))
        if f"{base}.downsample.0.weight" in sd:
            _set(params, path + ("downsample_conv",), "kernel",
                 _c2d(sd[f"{base}.downsample.0.weight"]))
            _convert_bn(sd, f"{base}.downsample.1", params, stats,
                        path + ("downsample_bn", "BatchNorm_0"))
    return params, stats


def depth_decoder_from_torch(sd: Mapping[str, np.ndarray], prefix: str = "decoder.") -> Dict:
    """Map a reference DepthDecoder state_dict (ModuleList layout) to our tree.

    Reference depth_decoder.py:39 flattens convs into ``decoder.{idx}``:
    idx 0..9 are upconv (i, j) for i=4..0, j=0..1; idx 10..13 are dispconv 0..3.
    """
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: Dict = {}
    idx = 0
    for i in range(4, -1, -1):
        for j in range(2):
            _set(params, (f"upconv_{i}_{j}", "conv"), "kernel",
                 _c2d(sd[f"decoder.{idx}.conv.conv.weight"]))
            _set(params, (f"upconv_{i}_{j}", "conv"), "bias",
                 sd[f"decoder.{idx}.conv.conv.bias"])
            idx += 1
    for s in range(4):
        _set(params, (f"dispconv_{s}", "conv"), "kernel",
             _c2d(sd[f"decoder.{idx}.conv.weight"]))
        _set(params, (f"dispconv_{s}", "conv"), "bias", sd[f"decoder.{idx}.conv.bias"])
        idx += 1
    return params


def pose_decoder_from_torch(sd: Mapping[str, np.ndarray], prefix: str = "decoder.") -> Dict:
    """Map a reference PoseDecoder state_dict (pose_decoder.py:25-33)."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: Dict = {}
    names = ["squeeze", "pose_0", "pose_1", "pose_2"]
    for i, name in enumerate(names):
        _set(params, (name,), "kernel", _c2d(sd[f"net.{i}.weight"]))
        _set(params, (name,), "bias", sd[f"net.{i}.bias"])
    return params


def depth_resnet_from_torch(sd: Mapping[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Full reference DepthResNet -> (params, batch_stats)."""
    enc_p, enc_s = resnet_encoder_from_torch(sd, prefix="encoder.encoder.")
    dec_p = depth_decoder_from_torch(sd, prefix="decoder.")
    return {"encoder": enc_p, "decoder": dec_p}, {"encoder": enc_s}


def pose_resnet_from_torch(sd: Mapping[str, np.ndarray]) -> Tuple[Dict, Dict]:
    """Full reference PoseResNet -> (params, batch_stats)."""
    enc_p, enc_s = resnet_encoder_from_torch(sd, prefix="encoder.encoder.")
    dec_p = pose_decoder_from_torch(sd, prefix="decoder.")
    return {"encoder": enc_p, "decoder": dec_p}, {"encoder": enc_s}


# --------------------------------------------------------------- pretrained

def adapt_conv1_multiimage(kernel: np.ndarray, num_input_images: int) -> np.ndarray:
    """Widen a flax conv1 kernel [kh, kw, 3, 64] for stacked-frame input.

    Parity with reference ``resnet_multiimage_input`` (resnet_encoder.py:41-58):
    the ImageNet conv1 weight is tiled across the input-channel axis and
    divided by the image count so activations keep their scale.
    """
    if num_input_images <= 1:
        return kernel
    return np.concatenate([kernel] * num_input_images, axis=2) / num_input_images


def _flatten_tree(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    flat = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            flat.update(_flatten_tree(v, key))
        else:
            flat[key] = np.asarray(v)
    return flat


def _unflatten_tree(flat: Mapping[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_encoder_artifact(path: str, params: Dict, stats: Dict):
    """Write converted encoder weights as a standalone npz artifact.

    The artifact is what ``pretrained_path`` configs point at — torch is only
    needed once, offline, to produce it (cli/convert_checkpoint.py
    ``--imagenet``)."""
    flat = {f"params/{k}": v for k, v in _flatten_tree(params).items()}
    flat.update({f"stats/{k}": v for k, v in _flatten_tree(stats).items()})
    np.savez(path, **flat)


def load_encoder_artifact(path: str) -> Tuple[Dict, Dict]:
    """Read an encoder-weights npz artifact -> (params, batch_stats)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    params = _unflatten_tree(
        {k[len("params/"):]: v for k, v in flat.items() if k.startswith("params/")})
    stats = _unflatten_tree(
        {k[len("stats/"):]: v for k, v in flat.items() if k.startswith("stats/")})
    return params, stats
