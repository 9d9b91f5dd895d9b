"""AOT export CLI: checkpoint → serialized StableHLO serving artifact.

Rebuild of ``src/save_jit.py`` (TorchScript trace at (1, 3, 640, 640)) +
the ``make ts-archive`` packaging step (``Makefile:71-77``). The default
artifact has a symbolic batch dimension, the fused inference head, and a
uint8 input graph with on-device mean subtraction — the same configuration
live serving runs.

Usage::

    python -m db_text_minimal_tpu.cli.export \
        --model_path models/best_cp.ckpt --out models/db.stablehlo \
        [--height 640 --width 640] [--batch N] [--no_fuse_head]
        [--float_input]
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
    parser.add_argument("--batch", type=int, default=None,
                        help="fixed batch size; default: symbolic (any)")
    parser.add_argument("--height", type=int, default=640)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--no_fuse_head", action="store_true",
                        help="export the plain DBHead instead of the "
                             "weight-equivalent fused inference head")
    parser.add_argument("--float_input", action="store_true",
                        help="f32 mean-subtracted input instead of uint8 "
                             "with on-device mean subtraction")
    parser.add_argument("--infer_mode", type=str, default="flax",
                        choices=("flax", "folded", "int8"),
                        help="folded: BN-folded forward; int8 additionally "
                             "quantizes the MXU-filling convs (requires "
                             "the fused head)")
    parser.add_argument("--prob_only", action="store_true",
                        help="export the prob-map-only graph (channel 0 is "
                             "all the detection postprocess reads)")
    args = parser.parse_args(argv)

    if args.infer_mode != "flax" and args.no_fuse_head:
        parser.error("--infer_mode folded/int8 requires the fused head")
    model, variables = load_model(args.model_path, backbone=args.backbone,
                                  fuse_head=not args.no_fuse_head)
    path = export_model(
        model, variables, args.out,
        input_shape=(args.batch, args.height, args.width, 3),
        uint8_input=not args.float_input,
        infer_mode=args.infer_mode, prob_only=args.prob_only)
    print(f"exported to {path} (+ {path}.params, {path}.meta.json)")
    return path


if __name__ == "__main__":
    main()
