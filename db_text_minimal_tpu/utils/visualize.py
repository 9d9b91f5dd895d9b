"""Visualization: heatmap/polygon/rect overlays and TB image grids.

Rebuild of the visualization half of ``src/utils.py``: ``visualize_tfb``
(:116-157), ``visualize_heatmap`` (:215-228), ``visualize_polygon``
(:231-283, including the perspective word-crop dump for recognition).
matplotlib uses the Agg backend (headless)."""

from __future__ import annotations

import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from . import minmax_scaler_img, draw_bbox  # noqa: E402


def make_grid(images: np.ndarray, padding: int = 2) -> np.ndarray:
    """torchvision ``make_grid`` equivalent for NHWC uint8/float arrays:
    single row layout (the reference grids one batch per row)."""
    n, h, w = images.shape[:3]
    c = images.shape[3] if images.ndim == 4 else 1
    imgs = images.reshape(n, h, w, c)
    grid = np.zeros((h + 2 * padding,
                     n * (w + padding) + padding, c), imgs.dtype)
    for i, im in enumerate(imgs):
        x0 = padding + i * (w + padding)
        grid[padding:padding + h, x0:x0 + w] = im
    return grid


def visualize_tfb(tfb_writer, imgs, preds, global_steps: int,
                  thresh: float = 0.5, mode: str = "TRAIN") -> None:
    """``src/utils.py:116-157``: original images + thresholded prob maps +
    thresh maps as TB image grids. ``imgs``/``preds`` are NHWC arrays."""
    imgs = np.asarray(imgs)
    preds = np.asarray(preds)
    origin = np.stack([minmax_scaler_img(im) for im in imgs])
    tfb_writer.add_image(f"{mode}/origin_imgs", make_grid(origin),
                         global_steps, dataformats="HWC")
    prob = (preds[..., 0] > thresh).astype(np.float32)[..., None]
    thr = preds[..., 1][..., None]
    tfb_writer.add_image(f"{mode}/prob_imgs", make_grid(prob, padding=0),
                         global_steps, dataformats="HWC")
    tfb_writer.add_image(f"{mode}/thres_imgs", make_grid(thr, padding=0),
                         global_steps, dataformats="HWC")


def visualize_heatmap(args, img_fn: str, tmp_img: np.ndarray,
                      tmp_pred: np.ndarray) -> str:
    """``src/utils.py:215-228``: thresholded prob-map overlay."""
    pred_prob = tmp_pred[..., 0] if tmp_pred.ndim == 3 else tmp_pred
    pred_prob = (pred_prob > args.prob_thred).astype(np.float32)
    np_img = minmax_scaler_img(np.asarray(tmp_img))
    plt.figure()
    plt.imshow(np_img)
    plt.imshow(pred_prob, cmap="jet", alpha=args.alpha)
    out_fn = "heatmap_result_{}".format(img_fn)
    out_path = os.path.join(args.save_dir, out_fn)
    plt.savefig(out_path, dpi=200, bbox_inches="tight")
    plt.close()
    return out_path


def filter_zero_boxes(box_list, score_list, is_output_polygon: bool):
    """``src/utils.py:243-253`` / ``src/make_eval.py:86-98``: drop all-zero
    placeholder boxes emitted by rect mode."""
    if len(box_list) == 0:
        return [], []
    if is_output_polygon:
        idx = [np.asarray(b).sum() > 0 for b in box_list]
        boxes = [b for b, keep in zip(box_list, idx) if keep]
        scores = [s for s, keep in zip(score_list, idx) if keep]
        return boxes, scores
    box_arr = np.asarray(box_list)
    idx = np.abs(box_arr.reshape(box_arr.shape[0], -1)).sum(axis=1) > 0
    return box_arr[idx], np.asarray(score_list)[idx]


def visualize_polygon(args, img_fn: str, origin_info, batch, preds,
                      seg_obj=None, vis_char: bool = False) -> str:
    """``src/utils.py:231-283``: postprocess + polygon/rect overlay; with
    ``vis_char`` also dumps perspective-rectified word crops for the
    recognition model (:258-272)."""
    import cv2

    from ..ops import geometry as geo
    from ..postprocess import SegDetectorRepresenter

    img_origin, h_origin, w_origin = origin_info
    if seg_obj is None:
        seg_obj = SegDetectorRepresenter(thresh=args.thresh,
                                         box_thresh=args.box_thresh,
                                         unclip_ratio=args.unclip_ratio)
    box_list, score_list = seg_obj(batch, preds,
                                   is_output_polygon=args.is_output_polygon)
    box_list, score_list = filter_zero_boxes(box_list[0], score_list[0],
                                             args.is_output_polygon)

    # box_list may be ragged in polygon mode (per-polygon vertex counts
    # differ) — draw_bbox iterates, so pass the list as-is
    tmp_img = draw_bbox(np.ascontiguousarray(img_origin), box_list)
    tmp_pred = cv2.resize(np.asarray(preds)[0, :, :, 0],
                          (w_origin, h_origin))

    if not args.is_output_polygon and vis_char:
        os.makedirs("./tmp/reconized", exist_ok=True)
        for f in os.listdir("./tmp/reconized"):
            os.remove(os.path.join("./tmp/reconized", f))
        h_, w_ = 32, 100
        dst = np.array([[0, 0], [w_, 0], [w_, h_], [0, h_]], np.float64)
        for index, box in enumerate(box_list):
            src = np.asarray(box, np.float64)
            matrix = geo.get_perspective_transform(src, dst)
            warp = geo.warp_perspective(img_origin, matrix, (w_, h_))
            cv2.imwrite("./tmp/reconized/word_{}.jpg".format(index),
                        warp[:, :, ::-1])

    plt.figure()
    plt.imshow(tmp_img)
    plt.imshow(tmp_pred, cmap="inferno", alpha=args.alpha)
    prefix = "poly" if args.is_output_polygon else "rect"
    out_path = os.path.join(args.save_dir,
                            "{}_result_{}".format(prefix, img_fn))
    plt.savefig(out_path, dpi=200, bbox_inches="tight")
    plt.close()
    return out_path
