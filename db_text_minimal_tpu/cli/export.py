"""AOT export CLI: checkpoint → serialized StableHLO serving artifact.

Rebuild of ``src/save_jit.py`` (TorchScript trace at (1, 3, 640, 640)) +
the ``make ts-archive`` packaging step (``Makefile:71-77``).

Usage::

    python -m db_text_minimal_tpu.cli.export \
        --model_path models/best_cp.ckpt --out models/db.stablehlo \
        [--height 640 --width 640 --batch 1]
"""

from __future__ import annotations

import argparse

from ..serve.export import export_model
from .common import load_model


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str, required=True)
    parser.add_argument("--backbone", type=str, default="resnet18")
    parser.add_argument("--out", type=str, default="./models/db.stablehlo")
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--height", type=int, default=640)
    parser.add_argument("--width", type=int, default=640)
    args = parser.parse_args(argv)

    model, variables = load_model(args.model_path, backbone=args.backbone)
    path = export_model(model, variables, args.out,
                        input_shape=(args.batch, args.height, args.width, 3))
    print(f"exported to {path} (+ {path}.params)")
    return path


if __name__ == "__main__":
    main()
