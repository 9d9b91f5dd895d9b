"""Structured (channel) pruning for DBNet — the reference's unchecked
"Model pruning" TODO (``/root/reference/README.md:109``), built TPU-first:
unstructured sparsity buys nothing on the MXU, so pruning here PHYSICALLY
removes output channels and re-slices every consumer, producing a smaller
dense model that is faster per step, not just smaller on disk.

Three channel groups are prunable without retracing residual ties:

1. **Backbone block-internal** — each BasicBlock's conv1→bn1→relu→conv2
   hidden width is private to the block (``resnet.py BasicBlock``).
2. **FPN inner add-chain** — the reduce/smooth 64-channel width is tied
   across all pyramid levels by the top-down adds (one keep-set, applied to
   reduce_conv_c2..c5 outputs, smooth_p2..p4 in+out, and all four input
   segments of the final conv).
3. **FPN output** (= head input) — the single largest conv in the net
   (3×3, 256→256 at stride-4 resolution, ~30 GFLOPs/img at 640²,
   docs/PERFORMANCE.md); pruning its output shrinks both it and the head
   branches' first convs.

Channel importance is the BN-folded output norm ``||W_c||₂ · γ_c/√(σ²_c+ε)``
— the channel's actual contribution magnitude after the batch norm that
training folded it through.

The transform returns pruned ``variables`` plus a ``widths`` dict matching
``DBTextModel``'s override fields; ``save_widths``/``load_widths`` persist
it as a ``<ckpt>.widths.json`` sidecar that ``cli.common.load_model``
applies automatically.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

BN_EPS = 1e-5


def _folded_out_norms(conv: dict, bn_params: dict, bn_stats: dict):
    """Per-output-channel contribution: kernel L2 × |γ|/√(σ²+ε)."""
    k = np.asarray(conv["kernel"], np.float64)
    norms = np.sqrt((k ** 2).sum(axis=tuple(range(k.ndim - 1))))
    gamma = np.abs(np.asarray(bn_params["scale"], np.float64))
    var = np.asarray(bn_stats["var"], np.float64)
    return norms * gamma / np.sqrt(var + BN_EPS)


def _prunable(keep) -> bool:
    """True when *keep* requests actual pruning. Floats are kept FRACTIONS
    (``None``/``1.0`` = leave the group untouched); ints are ABSOLUTE
    channel counts, so the int ``1`` means "keep exactly one channel" —
    a plain ``keep not in (None, 1.0)`` guard would swallow it because
    ``1 == 1.0``."""
    if keep is None or isinstance(keep, bool):
        return False
    if isinstance(keep, int):
        return True
    return float(keep) != 1.0


def _keep_indices(scores: np.ndarray, keep: float | int) -> np.ndarray:
    n = scores.shape[0]
    k = keep if isinstance(keep, int) else max(1, int(round(keep * n)))
    k = min(max(k, 1), n)
    return np.sort(np.argsort(scores)[::-1][:k])


def _slice_out(conv: dict, idx) -> dict:
    out = {"kernel": np.asarray(conv["kernel"])[..., idx]}
    if "bias" in conv:
        out["bias"] = np.asarray(conv["bias"])[idx]
    return out


def _slice_in(conv: dict, idx) -> dict:
    out = dict(conv)
    k = np.asarray(conv["kernel"])
    out["kernel"] = k[..., idx, :]
    return out


def _slice_bn(bn: dict, idx) -> dict:
    return {name: np.asarray(v)[idx] for name, v in bn.items()}


def _is_plain_conv(p: dict) -> bool:
    return set(p.keys()) <= {"kernel", "bias"}


def prune_dbnet_variables(variables: dict, *, backbone_keep: float = 1.0,
                          fpn_inner_keep: float | int | None = None,
                          fpn_out_keep: float | int | None = None):
    """Magnitude-prune a trained DBTextModel (resnet18/34 + FPN + DBHead)
    variables dict. ``*_keep`` are kept fractions (or absolute channel
    counts); 1.0/None leaves a group untouched. Returns
    ``(pruned_variables, widths)``."""
    params = _copy_tree(variables["params"])
    stats = _copy_tree(variables.get("batch_stats", {}))
    widths: dict[str, Any] = {}

    # -- group 1: backbone block-internal channels ------------------------
    bb_p, bb_s = params["backbone"], stats["backbone"]
    block_names = sorted(
        (k for k in bb_p if k.startswith("layer")),
        key=lambda n: (int(n[5]), int(n.split("_")[1])))
    hidden = []
    for name in block_names:
        blk_p, blk_s = bb_p[name], bb_s[name]
        prunable = (_prunable(backbone_keep)
                    and "conv3" not in blk_p        # BasicBlock only
                    and _is_plain_conv(blk_p["conv2"]))  # skip DCN blocks
        if not prunable:
            hidden.append(0)  # 0 = keep the default width
            continue
        scores = _folded_out_norms(blk_p["conv1"], blk_p["bn1"],
                                   blk_s["bn1"])
        idx = _keep_indices(scores, backbone_keep)
        blk_p["conv1"] = _slice_out(blk_p["conv1"], idx)
        blk_p["bn1"] = _slice_bn(blk_p["bn1"], idx)
        blk_s["bn1"] = _slice_bn(blk_s["bn1"], idx)
        blk_p["conv2"] = _slice_in(blk_p["conv2"], idx)
        hidden.append(int(idx.shape[0]))
    if any(hidden):
        widths["backbone_hidden"] = hidden

    body_p, body_s = params["segmentation_body"], stats["segmentation_body"]
    reduces = [f"reduce_conv_c{i}" for i in (2, 3, 4, 5)]
    smooths = [f"smooth_p{i}" for i in (2, 3, 4)]

    # -- group 2: FPN inner add-chain (one tied keep-set) ------------------
    if _prunable(fpn_inner_keep) and all(
            m in body_p for m in reduces + smooths):
        q = np.asarray(body_p[reduces[0]]["conv"]["kernel"]).shape[-1]
        scores = np.zeros(q, np.float64)
        for m in reduces + smooths:
            scores += _folded_out_norms(body_p[m]["conv"], body_p[m]["bn"],
                                        body_s[m]["bn"])
        idx = _keep_indices(scores, fpn_inner_keep)
        for m in reduces + smooths:
            body_p[m]["conv"] = _slice_out(body_p[m]["conv"], idx)
            body_p[m]["bn"] = _slice_bn(body_p[m]["bn"], idx)
            body_s[m]["bn"] = _slice_bn(body_s[m]["bn"], idx)
        for m in smooths:
            body_p[m]["conv"] = _slice_in(body_p[m]["conv"], idx)
        # final conv input = concat[p2, p3, p4, p5], each a q-wide segment
        cat_idx = np.concatenate([idx + s * q for s in range(4)])
        body_p["conv"] = _slice_in(body_p["conv"], cat_idx)
        widths["fpn_inner_quarter"] = int(idx.shape[0])

    # -- group 3: FPN output (= head input) --------------------------------
    if _prunable(fpn_out_keep) and "conv" in body_p:
        head_p = params["segmentation_head"]
        scores = _folded_out_norms(body_p["conv"], body_p["conv_bn"],
                                   body_s["conv_bn"])
        idx = _keep_indices(scores, fpn_out_keep)
        body_p["conv"] = _slice_out(body_p["conv"], idx)
        body_p["conv_bn"] = _slice_bn(body_p["conv_bn"], idx)
        body_s["conv_bn"] = _slice_bn(body_s["conv_bn"], idx)
        # pin the head width BEFORE shrinking its input (it defaults to
        # in_channels//4) and re-slice both branches' first convs
        widths["head_width"] = int(
            np.asarray(head_p["binarize"]["conv1"]["kernel"]).shape[-1])
        for branch in ("binarize", "thresh"):
            head_p[branch]["conv1"] = _slice_in(head_p[branch]["conv1"], idx)
        widths["fpn_out"] = int(idx.shape[0])

    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out, widths


def widths_to_model_kwargs(widths: dict | None) -> dict:
    """Translate a widths sidecar into DBTextModel constructor kwargs."""
    if not widths:
        return {}
    kw = {}
    if widths.get("backbone_hidden"):
        kw["backbone_hidden"] = tuple(widths["backbone_hidden"])
    for key in ("fpn_inner_quarter", "fpn_out", "head_width"):
        if widths.get(key):
            kw[key] = int(widths[key])
    return kw


def save_widths(ckpt_path: str, widths: dict) -> str:
    sidecar = ckpt_path + ".widths.json"
    with open(sidecar, "w") as f:
        json.dump(widths, f)
    return sidecar


def load_widths(ckpt_path: str) -> dict | None:
    sidecar = ckpt_path + ".widths.json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return json.load(f)
    return None


def _copy_tree(tree):
    from collections.abc import Mapping

    if isinstance(tree, Mapping):  # dict or flax FrozenDict
        return {k: _copy_tree(v) for k, v in tree.items()}
    return tree
