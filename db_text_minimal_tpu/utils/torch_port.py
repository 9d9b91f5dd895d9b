"""PyTorch → Flax checkpoint porting for DBNet.

Converts a reference ``db_resnet18.pth`` state_dict (``src/train.py:288-318``
checkpoints; torchvision-style resnet naming per ``src/modules/resnet.py``)
into this framework's NHWC Flax params + batch stats, so the BASELINE.json
F-measure-parity configuration can run the original weights on TPU.

Layout conversions:
- Conv2d weight  OIHW → HWIO
- ConvTranspose2d weight  (in, out, kh, kw) → (kh, kw, in, out), spatially
  flipped (torch's ConvTranspose is the conv adjoint; flax's
  ``transpose_kernel=False`` path is a true fractionally-strided conv)
- BatchNorm weight/bias → scale/bias; running_mean/var → batch_stats
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _conv_w(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _deconv_w(w) -> np.ndarray:
    # torch (in, out, kh, kw) -> flax (kh, kw, in, out), spatial flip
    w = np.asarray(w)[:, :, ::-1, ::-1]
    return np.transpose(w, (2, 3, 0, 1))


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


_LAYER_RE = re.compile(r"^layer(\d+)\.(\d+)\.(.*)$")


def _map_backbone(rest: str) -> list[str] | None:
    m = _LAYER_RE.match(rest)
    if m:
        stage, block, tail = m.group(1), m.group(2), m.group(3)
        prefix = [f"layer{stage}_{block}"]
        if tail.startswith("downsample.0."):
            return prefix + ["downsample_conv", tail.split(".")[-1]]
        if tail.startswith("downsample.1."):
            return prefix + ["downsample_bn", tail.split(".")[-1]]
        parts = tail.split(".")
        return prefix + parts
    parts = rest.split(".")
    if parts[0] in ("conv1", "bn1"):
        return parts
    return None  # avgpool/fc/smooth: unused by the forward pass


_HEAD_SEQ = {
    # nn.Sequential indices of both DBHead branches
    # (src/modules/segmentation_head.py:24-29, 58-78)
    "0": "conv1", "1": "bn1", "3": "deconv1", "4": "bn2", "6": "deconv2",
}


def torch_state_dict_to_flax(state_dict: Mapping[str, Any],
                             strict: bool = False):
    """Returns (params, batch_stats) pytrees matching ``DBTextModel``."""
    params: dict = {}
    stats: dict = {}
    skipped = []
    for name, value in state_dict.items():
        value = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        if name.startswith("module."):  # DataParallel shim, test_ocr.py:28-37
            name = name[len("module."):]
        if name.endswith("num_batches_tracked"):
            continue
        top, _, rest = name.partition(".")
        path: list[str] | None = None
        is_deconv = False
        if top == "backbone":
            mapped = _map_backbone(rest)
            if mapped is None:
                skipped.append(name)
                continue
            path = ["backbone"] + mapped
        elif top == "segmentation_body":
            parts = rest.split(".")
            if parts[0] == "conv":
                # final Sequential: conv.0 = Conv2d, conv.1 = BatchNorm2d
                if parts[1] == "0":
                    path = ["segmentation_body", "conv", parts[2]]
                elif parts[1] == "1":
                    path = ["segmentation_body", "conv_bn", parts[2]]
                else:
                    skipped.append(name)
                    continue
            else:
                # reduce_conv_cX / smooth_pX -> ConvBnRelu {conv,bn}
                path = ["segmentation_body"] + parts
        elif top == "segmentation_head":
            parts = rest.split(".")
            branch, idx, leaf = parts[0], parts[1], parts[2]
            layer = _HEAD_SEQ.get(idx)
            if layer is None:
                skipped.append(name)
                continue
            is_deconv = layer.startswith("deconv")
            path = ["segmentation_head", branch, layer, leaf]
        else:
            skipped.append(name)
            continue

        leaf = path[-1]
        if leaf == "weight":
            if value.ndim == 4:
                value = _deconv_w(value) if is_deconv else _conv_w(value)
                _set(params, path[:-1] + ["kernel"], value)
            else:  # batch-norm scale
                _set(params, path[:-1] + ["scale"], value)
        elif leaf == "bias":
            _set(params, path[:-1] + ["bias"], value)
        elif leaf == "running_mean":
            _set(stats, path[:-1] + ["mean"], value)
        elif leaf == "running_var":
            _set(stats, path[:-1] + ["var"], value)
        else:
            skipped.append(name)

    if strict and skipped:
        raise ValueError(f"unmapped torch keys: {skipped}")
    return params, stats


def load_torch_checkpoint(path: str):
    """Load a ``.pth`` state_dict and convert. Requires torch (CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict):
        sd = sd.state_dict()
    return torch_state_dict_to_flax(sd)


def torchvision_resnet_to_flax(state_dict: Mapping[str, Any]):
    """Convert a torchvision-format ImageNet ResNet state_dict (keys like
    ``conv1.weight``, ``layer1.0.conv1.weight`` — the model-zoo files the
    reference downloads at ``src/modules/resnet.py:245-255`` and loads
    ``strict=False``) into backbone params + batch stats. The classifier
    head (``fc.*``) is dropped, mirroring the reference's forward pass which
    never uses it."""
    prefixed = {"backbone." + k: v for k, v in state_dict.items()
                if not k.startswith("fc.")}
    params, stats = torch_state_dict_to_flax(prefixed)
    return params.get("backbone", {}), stats.get("backbone", {})


def flax_backbone_to_torchvision(params: Mapping[str, Any],
                                 stats: Mapping[str, Any]) -> dict:
    """Inverse of ``torchvision_resnet_to_flax``: export a Flax ResNet
    backbone subtree as a torchvision-format state_dict (numpy values).
    Enables in-tree pretrained backbones to round-trip through the exact
    ``.pth`` import path the reference uses for its model-zoo weights
    (``src/modules/resnet.py:245-255``)."""

    def conv_w(k):
        return np.transpose(np.asarray(k), (3, 2, 0, 1))  # HWIO -> OIHW

    sd: dict = {}

    def put_bn(prefix, p, s):
        sd[prefix + ".weight"] = np.asarray(p["scale"])
        sd[prefix + ".bias"] = np.asarray(p["bias"])
        sd[prefix + ".running_mean"] = np.asarray(s["mean"])
        sd[prefix + ".running_var"] = np.asarray(s["var"])
        sd[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)

    sd["conv1.weight"] = conv_w(params["conv1"]["kernel"])
    put_bn("bn1", params["bn1"], stats["bn1"])
    for name in sorted(k for k in params if k.startswith("layer")):
        stage, block = name[len("layer"):].split("_")
        tv = f"layer{stage}.{block}"
        sub, sst = params[name], stats[name]
        for leaf in sub:
            if leaf.startswith("conv"):
                sd[f"{tv}.{leaf}.weight"] = conv_w(sub[leaf]["kernel"])
            elif leaf.startswith("bn"):
                put_bn(f"{tv}.{leaf}", sub[leaf], sst[leaf])
            elif leaf == "downsample_conv":
                sd[f"{tv}.downsample.0.weight"] = conv_w(sub[leaf]["kernel"])
            elif leaf == "downsample_bn":
                put_bn(f"{tv}.downsample.1", sub[leaf], sst[leaf])
    return sd


def save_backbone_pth(path: str, params, batch_stats) -> None:
    """torch.save a Flax backbone as a torchvision-format ``.pth``."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v).copy())
          if np.asarray(v).ndim else torch.tensor(v)
          for k, v in flax_backbone_to_torchvision(params,
                                                   batch_stats).items()}
    torch.save(sd, path)


def load_pretrained_backbone(path: str, params, batch_stats):
    """Warm-start the backbone subtree of a DBTextModel params pytree from a
    torchvision ResNet ``.pth``; other subtrees pass through unchanged."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict):
        sd = sd.state_dict()
    bb_params, bb_stats = torchvision_resnet_to_flax(sd)

    def merge(dst: dict, src: dict) -> dict:
        out = dict(dst)
        for key, value in src.items():
            if key in out and isinstance(value, dict):
                out[key] = merge(out[key], value)
            elif key in out:
                assert out[key].shape == value.shape, (
                    key, out[key].shape, value.shape)
                out[key] = value
        return out

    params = dict(params)
    batch_stats = dict(batch_stats)
    params["backbone"] = merge(params.get("backbone", {}), bb_params)
    batch_stats["backbone"] = merge(batch_stats.get("backbone", {}),
                                    bb_stats)
    return params, batch_stats
