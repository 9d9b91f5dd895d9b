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

from ..train.backbone_pretrain import pretrain_backbone


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--train_dir", type=str, required=True)
    parser.add_argument("--gt_dir", type=str, required=True)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--backbone", type=str, default="resnet18")
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--limit_images", type=int, default=256)
    args = parser.parse_args(argv)
    result = pretrain_backbone(
        args.train_dir, args.gt_dir, args.out, backbone=args.backbone,
        steps=args.steps, batch_size=args.batch_size, lr=args.lr,
        seed=args.seed, limit_images=args.limit_images)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
