"""Batch evaluation generator: run inference + postprocess over a test
directory and dump prediction pickles for the ioueval/deteval CLIs.

Rebuild of ``src/make_eval.py`` plus the GT exporter the reference lacks
(nothing in its tree writes the ``result_poly_gts.pkl`` its evaluators
consume — SURVEY.md §2a #17): ``--gt_dir``/``--dataset`` here emit the GT
pickle alongside predictions.

Usage::

    python -m db_text_minimal_tpu.cli.make_eval --image_dir imgs/ \
        --model_path models/best_cp.ckpt \
        --gt_dir gts/ --dataset totaltext
"""

from __future__ import annotations

import argparse
import glob
import os
import pickle
import sys

import jax.numpy as jnp
import numpy as np

from ..data.parsers import PARSERS
from ..postprocess import DeviceBoxRepresenter, SegDetectorRepresenter
from ..utils import read_img, test_preprocess, str_to_bool
from ..utils.visualize import filter_zero_boxes
from .common import build_inference_forward


def load_args(argv=None):
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--image_dir", type=str, required=True)
    parser.add_argument("--model_path", type=str,
                        default="./models/best_cp.ckpt")
    parser.add_argument("--backbone", type=str, default="resnet18")
    parser.add_argument("--save_dir", type=str, default="./assets")
    parser.add_argument("--device", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=1,
                        help="batch images through the model (pads each to "
                             "the square canvas so shapes stay static; >1 "
                             "is a TPU-throughput upgrade over the "
                             "reference's one-image-at-a-time loop)")
    parser.add_argument("--thresh", type=float, default=0.3)
    parser.add_argument("--box_thresh", type=float, default=0.5)
    parser.add_argument("--unclip_ratio", type=float, default=1.5)
    parser.add_argument("--is_output_polygon", type=str_to_bool, default=True)
    parser.add_argument("--device_boxes", type=str_to_bool, default=True,
                        help="rect mode only: extract oriented boxes on "
                             "device (threshold+CC+min-rects under jit; K "
                             "records D2H instead of full maps). Matches "
                             "the host path within 0.1 pt on every "
                             "committed checkpoint with hole-filled "
                             "scoring. Ignored when --is_output_polygon.")
    parser.add_argument("--infer_mode", type=str, default="flax",
                        choices=("flax", "folded", "int8"),
                        help="flax = parity forward; folded = BN-folded "
                             "prob-only forward (same numerics class, "
                             "faster); int8 = + PTQ of the wide convs "
                             "(dynamic activation scales)")
    parser.add_argument("--preds_fp", type=str,
                        default="./data/result_poly_preds.pkl")
    parser.add_argument("--img_fns_fp", type=str,
                        default="./data/img_fns.pkl")
    # GT exporter (new capability; closes the reference's missing-GT gap)
    parser.add_argument("--gt_dir", type=str, default=None)
    parser.add_argument("--dataset", type=str, default="totaltext",
                        choices=sorted(PARSERS))
    parser.add_argument("--gts_fp", type=str,
                        default="./data/result_poly_gts.pkl")
    parser.add_argument("--ignore_tags", type=str, nargs="*",
                        default=["#", "###"])
    return parser.parse_args(argv)


def export_gts(args, img_fps: list[str]) -> None:
    """Write the GT pickle in the structure the evaluators consume
    (``src/iou.py:275-279``)."""
    parser = PARSERS[args.dataset]
    if args.dataset == "msra_td500":
        fps, anns = parser(args.gt_dir)
    else:
        fps, anns = parser(args.image_dir, args.gt_dir)
    by_name = {os.path.basename(fp): ann for fp, ann in zip(fps, anns)}
    gts = []
    for fp in img_fps:
        ann = by_name.get(os.path.basename(fp), [])
        gts.append([{"points": [tuple(p) for p in a["poly"]],
                     "text": a["text"],
                     "ignore": a["text"] in args.ignore_tags}
                    for a in ann])
    os.makedirs(os.path.dirname(args.gts_fp) or ".", exist_ok=True)
    with open(args.gts_fp, "wb") as f:
        pickle.dump(gts, f)
    print(f"wrote {len(gts)} GT entries to {args.gts_fp}")


def _predict_one(forward, variables, seg_obj, args, img_origin, h_origin,
                 w_origin):
    tmp_img = test_preprocess(img_origin)
    batch = {"shape": [(h_origin, w_origin)]}
    preds = np.asarray(forward(variables, jnp.asarray(tmp_img)))
    box_list, score_list = seg_obj(batch, preds,
                                   is_output_polygon=args.is_output_polygon)
    return filter_zero_boxes(box_list[0], score_list[0],
                             args.is_output_polygon)


def _predict_batched(forward, variables, seg_obj, args, images, sizes,
                     canvas: int = 640):
    """Batch forward over square-padded images (static shapes → one compiled
    program), then per-image postprocess. With pad, content occupies
    [0 : size·s] of the canvas at scale s = canvas/max(h, w); postprocess
    rescales by dest/canvas, so dest = max(h, w) maps predictions back to
    original coordinates (then clip to the true image bounds)."""
    batch_imgs = np.concatenate(
        [test_preprocess(img, pad=True, size=canvas) for img in images])
    preds = np.asarray(forward(variables, jnp.asarray(batch_imgs)))
    results = []
    for i, (h_origin, w_origin) in enumerate(sizes):
        side = max(h_origin, w_origin)
        batch = {"shape": [(side, side)]}
        box_list, score_list = seg_obj(
            batch, preds[i:i + 1], is_output_polygon=args.is_output_polygon)
        boxes, scores = filter_zero_boxes(box_list[0], score_list[0],
                                          args.is_output_polygon)
        clipped = []
        for b in boxes:
            b = np.asarray(b).astype(np.float64)
            b[:, 0] = np.clip(b[:, 0], 0, w_origin)
            b[:, 1] = np.clip(b[:, 1], 0, h_origin)
            clipped.append(b.astype(np.int64))
        results.append((clipped, scores))
    return results


def main(args):
    """``src/make_eval.py:54-122``."""

    # box/polygon extraction reads only the prob map
    # (src/postprocess.py:33) — folded modes skip the thresh tail
    net, variables, forward = build_inference_forward(
        args.model_path, backbone=args.backbone,
        infer_mode=args.infer_mode)
    rep_cls = (DeviceBoxRepresenter
               if args.device_boxes and not args.is_output_polygon
               else SegDetectorRepresenter)
    seg_obj = rep_cls(thresh=args.thresh, box_thresh=args.box_thresh,
                      unclip_ratio=args.unclip_ratio)

    test_img_fps = sorted(glob.glob(os.path.join(args.image_dir, "*")))
    result_poly_preds = []
    img_fns = []

    def to_records(box_list):
        return [{"points": [tuple(p) for p in np.asarray(b).tolist()],
                 "text": "text_sample", "ignore": False} for b in box_list]

    if args.batch_size > 1:
        for start in range(0, len(test_img_fps), args.batch_size):
            chunk = test_img_fps[start:start + args.batch_size]
            images, sizes = [], []
            for fp in chunk:
                img_fns.append(fp.split("/")[-1])
                img, h, w = read_img(fp)
                images.append(img)
                sizes.append((h, w))
            # static shapes: pad the tail chunk to the full batch
            pad_n = args.batch_size - len(images)
            images += [images[-1]] * pad_n
            sizes += [sizes[-1]] * pad_n
            try:
                results = _predict_batched(forward, variables, seg_obj,
                                           args, images, sizes)
                for boxes, _ in results[:len(chunk)]:
                    result_poly_preds.append(to_records(boxes))
            except Exception as e:
                print(type(e).__name__, e, chunk[0], file=sys.stderr)
                result_poly_preds.extend([[] for _ in chunk])
    else:
        for test_img_fp in test_img_fps:
            try:
                img_fns.append(test_img_fp.split("/")[-1])
                img_origin, h_origin, w_origin = read_img(test_img_fp)
                boxes, _ = _predict_one(forward, variables, seg_obj, args,
                                        img_origin, h_origin, w_origin)
                result_poly_preds.append(to_records(boxes))
            except Exception as e:  # per-image skip (make_eval.py:114-119)
                print(type(e).__name__, e, test_img_fp, file=sys.stderr)
                result_poly_preds.append([])
                continue

    os.makedirs(os.path.dirname(args.preds_fp) or ".", exist_ok=True)
    with open(args.preds_fp, "wb") as f:
        pickle.dump(result_poly_preds, f)
    with open(args.img_fns_fp, "wb") as f:
        pickle.dump(img_fns, f)
    print(f"wrote {len(result_poly_preds)} predictions to {args.preds_fp}")

    if args.gt_dir:
        export_gts(args, test_img_fps)


if __name__ == "__main__":
    main(load_args())
