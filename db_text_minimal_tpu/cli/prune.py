"""Structured channel pruning CLI — the reference's unchecked "Model
pruning" TODO (``/root/reference/README.md:109``), TPU-first: physically
removes channels (smaller dense convs → fewer MXU FLOPs), see
``models/prune.py``.

    python -m db_text_minimal_tpu.cli.prune \
        --checkpoint /tmp/hb_models/hb30.ckpt --out /tmp/hb_models/hb30_p50.ckpt \
        --backbone_keep 0.5 --fpn_inner_keep 0.75 --fpn_out_keep 0.5

The pruned checkpoint carries a ``.widths.json`` sidecar; every loader
(``cli.common.load_model``, ``quality_bench --checkpoint``) applies it
transparently. Evaluate quality with
``quality_bench --eval_only --checkpoint <out>``; fine-tune by training
with ``--checkpoint <out>`` (the trainer builds the narrow architecture
from the sidecar).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil

import jax
import numpy as np


def conv_weight_macs(params: dict) -> float:
    """Sum of per-pixel conv MACs (kh·kw·cin·cout over every conv kernel).
    Not spatially weighted — use the before/after RATIO, not the absolute
    number (real FLOPs need each conv's feature-map size)."""
    total = 0.0

    def walk(tree):
        nonlocal total
        for v in tree.values():
            if isinstance(v, dict):
                if "kernel" in v:
                    k = np.asarray(v["kernel"])
                    if k.ndim == 4:
                        kh, kw, cin, cout = k.shape
                        total += kh * kw * cin * cout
                else:
                    walk(v)

    walk(params)
    return total


def _keep_arg(s: str):
    """Keep spec: values in (0, 1] are kept FRACTIONS, values > 1 are
    ABSOLUTE channel counts (forwarded as int — a bare float coercion
    would silently strand prune_dbnet_variables' int path).

    Limitation (ADVICE r4): '1' parses as fraction 1.0 (no pruning); the
    library-level int 1 ('keep exactly one channel') is NOT expressible
    from the CLI — use the Python API for single-channel keeps."""
    v = float(s)
    if v > 1:
        return int(round(v))
    return v


def load_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--backbone_keep", type=_keep_arg, default=1.0,
                   help="kept fraction (<=1) or absolute channel count (>1) "
                        "of each BasicBlock's internal conv1 channels "
                        "(1.0 = no pruning; a count of exactly 1 is not "
                        "expressible — '1' means fraction 1.0)")
    p.add_argument("--fpn_inner_keep", type=_keep_arg, default=1.0,
                   help="kept fraction (<=1) or count (>1) of the tied FPN "
                        "reduce/smooth width")
    p.add_argument("--fpn_out_keep", type=_keep_arg, default=1.0,
                   help="kept fraction (<=1) or count (>1) of the FPN "
                        "output (= head input)")
    return p.parse_args(argv)


def main(args=None):
    args = args or load_args()
    from ..models.prune import (load_widths, prune_dbnet_variables,
                                save_widths)
    from ..train.checkpoints import load_params_any, save_checkpoint

    variables = jax.device_get(load_params_any(args.checkpoint))
    pruned, widths = prune_dbnet_variables(
        variables,
        backbone_keep=args.backbone_keep,
        fpn_inner_keep=args.fpn_inner_keep,
        fpn_out_keep=args.fpn_out_keep)
    # re-pruning an already-pruned checkpoint: carry forward the source
    # sidecar's widths for any group this pass left untouched (per-block
    # for the backbone list, where 0 means "default width")
    old = load_widths(args.checkpoint) or {}
    if old:
        merged = {**old, **widths}
        if old.get("backbone_hidden") and widths.get("backbone_hidden"):
            merged["backbone_hidden"] = [
                n or o for n, o in zip(widths["backbone_hidden"],
                                       old["backbone_hidden"])]
        widths = merged

    n_full = sum(x.size for x in jax.tree.leaves(variables["params"]))
    n_pruned = sum(x.size for x in jax.tree.leaves(pruned["params"]))
    f_full = conv_weight_macs(variables["params"])
    f_pruned = conv_weight_macs(pruned["params"])

    save_checkpoint(args.out, pruned)
    save_widths(args.out, widths)
    # carry training provenance along (quality_bench sidecar)
    src_cfg = args.checkpoint + ".train_config.json"
    if os.path.exists(src_cfg):
        shutil.copy(src_cfg, args.out + ".train_config.json")

    report = {
        "widths": widths,
        "params": {"full": int(n_full), "pruned": int(n_pruned),
                   "ratio": round(n_pruned / n_full, 4)},
        "conv_weight_macs": {"full": float(f_full), "pruned": float(f_pruned),
                             "ratio": round(f_pruned / f_full, 4)},
        "out": args.out,
    }
    print(json.dumps(report, indent=1))
    return report


if __name__ == "__main__":
    main()
