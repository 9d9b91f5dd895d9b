"""Pretrain a ResNet backbone on the text/no-text pretext task and export
torchvision-format ``.pth`` weights for ``model.pretrained_backbone_path``.

Usage::

    python -m db_text_minimal_tpu.cli.pretrain_backbone \
        --train_dir data/train_images --gt_dir data/train_gts \
        --out models/backbone_pretext.pth [--steps 300] [--backbone resnet18]
"""

from __future__ import annotations

import argparse
import json

from ..train.backbone_pretrain import (pretrain_backbone,
                                       pretrain_backbone_dense)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_dir", type=str, required=True)
    parser.add_argument("--gt_dir", type=str, required=True)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--backbone", type=str, default="resnet18")
    parser.add_argument("--pretext", type=str, default="dense",
                        choices=("dense", "classify"),
                        help="dense = per-cell text-layout prediction "
                             "(stride 8, the warm start that transfers); "
                             "classify = the round-2 binary patch task "
                             "(kept for comparison)")
    parser.add_argument("--steps", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--limit_images", type=int, default=None)
    args = parser.parse_args(argv)
    if args.pretext == "dense":
        result = pretrain_backbone_dense(
            args.train_dir, args.gt_dir, args.out, backbone=args.backbone,
            steps=1000 if args.steps is None else args.steps,
            batch_size=args.batch_size,
            lr=2e-3 if args.lr is None else args.lr, seed=args.seed,
            limit_images=(512 if args.limit_images is None
                          else args.limit_images))
    else:
        result = pretrain_backbone(
            args.train_dir, args.gt_dir, args.out, backbone=args.backbone,
            steps=300 if args.steps is None else args.steps,
            batch_size=args.batch_size,
            lr=1e-3 if args.lr is None else args.lr, seed=args.seed,
            limit_images=(256 if args.limit_images is None
                          else args.limit_images))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
