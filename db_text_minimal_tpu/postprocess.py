"""Post-processing: probability maps → text polygons / rotated boxes.

TPU-native rebuild of ``src/postprocess.py``'s ``SegDetectorRepresenter``
(:7-198). The device side binarizes the prob map under jit; the host side
finishes with the first-party geometry library (contours, Douglas–Peucker,
unclip offsetting, rotating-calipers min-rect) — the same device/host split
the reference effectively had (D2H at ``src/postprocess.py:61-62``, then
cv2/pyclipper on CPU), but with all geometry first-party.

Defaults mirror the reference (:8-17): thresh 0.3, box_thresh 0.7,
max_candidates 1000, unclip_ratio 1.5, min_size 3.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

from .ops import geometry as geo


class DeviceBoxRepresenter:
    """Rect-mode postprocess that runs ON DEVICE (north-star item): threshold
    → connected components → oriented min-rects → unclip → filters, all under
    jit (``ops.pallas.cc.device_boxes``); the host only orders corners and
    rescales K kept records per image. Against the host
    ``SegDetectorRepresenter`` rect mode this transfers N·K box records
    instead of N·H·W prob-map pixels (reference D2H at
    ``src/postprocess.py:61-62``).

    Same ``__call__`` contract as ``SegDetectorRepresenter`` (rect mode
    only); polygon mode stays on host for exact parity runs.
    """

    def __init__(self, thresh=0.3, box_thresh=0.7, max_candidates=1000,
                 unclip_ratio=1.5, min_size=3, hole_filled_score=True):
        # max_candidates matches the host representer / reference
        # (``src/postprocess.py:11``). Component slots are assigned in
        # raster order of each component's root pixel, so a lower cap
        # silently drops real text below any noise speckles that come
        # first — measured -2 kept boxes of 8 on a 150-speckle map.
        # hole_filled_score=True scores each component over its filled
        # support (component + enclosed holes) to match the host's
        # filled-outer-contour mean; False is the pre-r3 component-only
        # mean (kept for ablation).
        self.thresh = thresh
        self.box_thresh = box_thresh
        self.max_candidates = max_candidates
        self.unclip_ratio = unclip_ratio
        self.min_size = min_size
        self.hole_filled_score = hole_filled_score

    def __call__(self, batch: dict, pred, is_output_polygon: bool = False):
        """``pred``: device array NHWC (or (N, H, W)); channel 0 is consumed.
        Stays on device until the K-record transfer; the unclip runs on
        HOST over those K rects with the exact chord-approximated offset
        the host path / reference use (``finish_device_rects``) — the
        device's ideal ``+d`` growth was ~0.4 px/side larger, enough to
        flip DetEval's tp=0.4 area-precision gates on curved text."""
        assert not is_output_polygon, \
            "polygon mode runs on host (SegDetectorRepresenter)"
        from .ops.pallas.cc import device_boxes

        if pred.ndim == 4:
            pred = pred[..., 0]
        height, width = pred.shape[1], pred.shape[2]
        corners, scores, keep = device_boxes(
            pred, thresh=self.thresh, box_thresh=self.box_thresh,
            unclip_ratio=self.unclip_ratio, min_size=self.min_size,
            max_components=self.max_candidates, unclip=False,
            hole_filled_score=self.hole_filled_score)
        # one D2H of (N, K) records
        corners = np.asarray(corners)
        scores = np.asarray(scores)
        keep = np.asarray(keep)
        boxes_batch, scores_batch = [], []
        for i in range(corners.shape[0]):
            dest_h, dest_w = batch["shape"][i]
            boxes, kept_scores = finish_device_rects(
                corners[i][keep[i]], scores[i][keep[i]], width, height,
                dest_w, dest_h, unclip_ratio=self.unclip_ratio,
                min_size=self.min_size)
            boxes_batch.append(boxes)
            scores_batch.append(kept_scores)
        return boxes_batch, scores_batch


class DevicePolyRepresenter:
    """Device-assisted POLYGON mode (VERDICT r2 ask #4): the device runs
    threshold → CC → per-component bbox + hole-filled mean-prob score and
    bit-packs the binary map (``ops.pallas.cc.device_poly_stats``); the
    host unpacks 1 bit/pixel (32× less D2H than the f32 prob map the
    reference ships at ``src/postprocess.py:61-62``), traces exact
    contours, Douglas-Peuckers, unclips — the identical geometry sequence
    of ``polygons_from_bitmap`` (``src/postprocess.py:54-104``) — and
    looks each contour's score up by bbox match (an outer contour's bbox
    equals its component's pixel bbox). Unmatched contours are hole
    borders; the host path rejects those at the ``box_thresh`` gate
    whenever ``box_thresh > thresh`` (a hole's interior prob is ≤ thresh
    by construction), so dropping them matches the host in every
    supported config. Known divergence: when another component is NESTED
    inside a component's hole, the host's filled-outer-contour mean also
    includes the nested component's pixels while the device mean covers
    the component + its holes only (the nested component itself scores
    exactly); and two distinct components sharing a bit-identical pixel
    bbox make the score pairing within that bbox ambiguous.
    """

    def __init__(self, thresh=0.3, box_thresh=0.7, max_candidates=1000,
                 unclip_ratio=1.5, min_size=3):
        if box_thresh <= thresh:
            # dropping score-unmatched contours (hole borders) only matches
            # the host when the box_thresh gate would reject them anyway —
            # see the class docstring. Outside that regime the silent
            # divergence is unacceptable; use the host representer.
            raise ValueError(
                f"DevicePolyRepresenter requires box_thresh > thresh "
                f"(got box_thresh={box_thresh}, thresh={thresh}); use "
                f"SegDetectorRepresenter for this configuration")
        self.thresh = thresh
        self.box_thresh = box_thresh
        self.max_candidates = max_candidates
        self.unclip_ratio = unclip_ratio
        self.min_size = min_size

    def __call__(self, batch: dict, pred, is_output_polygon: bool = True):
        assert is_output_polygon, "rect mode: use DeviceBoxRepresenter"
        from .ops.pallas.cc import device_poly_stats

        if pred.ndim == 4:
            pred = pred[..., 0]
        height, width = pred.shape[1], pred.shape[2]
        packed, bboxes, scores, valid = device_poly_stats(
            pred, thresh=self.thresh, max_components=self.max_candidates)
        packed = np.asarray(packed)
        bboxes = np.asarray(bboxes)
        scores = np.asarray(scores)
        valid = np.asarray(valid)
        boxes_batch, scores_batch = [], []
        for i in range(packed.shape[0]):
            dest_h, dest_w = batch["shape"][i]
            bitmap = np.unpackbits(packed[i], axis=-1)[:, :width]
            # bbox -> scores. Two DISTINCT components can share an
            # identical pixel bbox (e.g. crossing diagonal strokes); keep
            # every score under the key and pop one per matched contour so
            # no component's score is silently overwritten (the pairing
            # within a collision is ambiguous, but collisions require
            # bit-identical bboxes and are vanishingly rare).
            score_lut: dict = {}
            for bb, s, v in zip(bboxes[i], scores[i], valid[i]):
                if v:
                    score_lut.setdefault(tuple(bb), []).append(float(s))
            boxes, kept = self._finish(bitmap, score_lut, width, height,
                                       dest_w, dest_h)
            boxes_batch.append(boxes)
            scores_batch.append(kept)
        return boxes_batch, scores_batch

    def _finish(self, bitmap, score_lut, width, height, dest_w, dest_h):
        """Host finishing: ``polygons_from_bitmap`` geometry with device
        scores (``src/postprocess.py:54-104`` order of gates)."""
        boxes, scores = [], []
        contours = geo.find_contours(bitmap.astype(np.uint8))
        for contour in contours[:self.max_candidates]:
            contour = np.asarray(contour, dtype=np.float64)
            epsilon = 0.005 * geo.polygon_perimeter(contour)
            points = geo.approx_poly_dp(contour, epsilon)
            if points.shape[0] < 4:
                continue
            key = (int(contour[:, 0].min()), int(contour[:, 1].min()),
                   int(contour[:, 0].max()), int(contour[:, 1].max()))
            bucket = score_lut.get(key)
            if not bucket:
                continue  # hole border (see class docstring)
            score = bucket.pop()
            if self.box_thresh > score:
                continue
            expanded = _unclip(points, self.unclip_ratio)
            if len(expanded) != 1:
                continue
            box = np.asarray(expanded[0], dtype=np.float64).reshape(-1, 2)
            _, (w, h) = geo.min_area_rect(box)
            if min(w, h) < self.min_size + 2:
                continue
            box[:, 0] = np.clip(np.round(box[:, 0] / width * dest_w), 0,
                                dest_w)
            box[:, 1] = np.clip(np.round(box[:, 1] / height * dest_h), 0,
                                dest_h)
            boxes.append(box.astype(np.int64))
            scores.append(score)
        return boxes, scores


def finish_device_rects(quads: np.ndarray, scores: np.ndarray,
                        width: int, height: int, dest_w: int, dest_h: int,
                        unclip_ratio: float = 1.5, min_size: int = 3):
    """Host finishing for PRE-unclip device rects (K tiny records): the
    exact unclip → minAreaRect → size filter → order → rescale sequence of
    the host rect path (``src/postprocess.py:106-148``), so device-path
    boxes are bit-comparable to host-path boxes."""
    out, kept_scores = [], []
    for quad, score in zip(np.asarray(quads, np.float64),
                           np.asarray(scores, np.float32)):
        points = np.array(order_rect_points(quad))
        expanded = _unclip(points, unclip_ratio)
        if not expanded:
            continue
        corners2, (w2, h2) = geo.min_area_rect(
            np.asarray(expanded[0], np.float64))
        if min(w2, h2) < min_size + 2:
            continue
        box = np.array(order_rect_points(corners2))
        box[:, 0] = np.clip(np.round(box[:, 0] / width * dest_w), 0, dest_w)
        box[:, 1] = np.clip(np.round(box[:, 1] / height * dest_h), 0, dest_h)
        out.append(box.astype(np.int16))
        kept_scores.append(score)
    boxes = (np.stack(out) if out
             else np.zeros((0, 4, 2), dtype=np.int16))
    return boxes, np.asarray(kept_scores, np.float32)


def _unclip(box, unclip_ratio: float = 1.5):
    """``src/postprocess.py:150-156``: dilate by d = A·ratio/L."""
    box = np.asarray(box, dtype=np.float64)
    area = geo.polygon_area(box)
    length = geo.polygon_perimeter(box)
    if length <= 0:
        return []
    distance = area * unclip_ratio / length
    return geo.offset_polygon(box, distance)


def order_rect_points(corners: np.ndarray):
    """Clockwise-from-top-left corner ordering of 4 rect points
    (``get_mini_boxes``, ``src/postprocess.py:158-184``)."""
    points = sorted(corners.tolist(), key=lambda x: x[0])
    if points[1][1] > points[0][1]:
        i1, i4 = 0, 1
    else:
        i1, i4 = 1, 0
    if points[3][1] > points[2][1]:
        i2, i3 = 2, 3
    else:
        i2, i3 = 3, 2
    return [points[i1], points[i2], points[i3], points[i4]]


class SegDetectorRepresenter:
    """``src/postprocess.py:7-49``."""

    def __init__(self, thresh=0.3, box_thresh=0.7, max_candidates=1000,
                 unclip_ratio=1.5):
        self.min_size = 3
        self.thresh = thresh
        self.box_thresh = box_thresh
        self.max_candidates = max_candidates
        self.unclip_ratio = unclip_ratio

    def __call__(self, batch: dict, pred, is_output_polygon: bool = False):
        """``pred``: NHWC (N, H, W, C) with channel 0 the prob map (only
        channel 0 is consumed, ``src/postprocess.py:33``); ``batch['shape']``
        lists the original (H, W) per image."""
        pred = np.asarray(pred)[..., 0]
        segmentation = self.binarize(pred)
        boxes_batch, scores_batch = [], []
        for batch_index in range(pred.shape[0]):
            height, width = batch["shape"][batch_index]
            if is_output_polygon:
                boxes, scores = self.polygons_from_bitmap(
                    pred[batch_index], segmentation[batch_index], width,
                    height)
            else:
                boxes, scores = self.boxes_from_bitmap(
                    pred[batch_index], segmentation[batch_index], width,
                    height)
            boxes_batch.append(boxes)
            scores_batch.append(scores)
        return boxes_batch, scores_batch

    def binarize(self, pred: np.ndarray) -> np.ndarray:
        """``src/postprocess.py:51`` (P > thresh)."""
        return pred > self.thresh

    def polygons_from_bitmap(self, pred, bitmap, dest_width, dest_height):
        """``src/postprocess.py:54-104``."""
        assert bitmap.ndim == 2
        height, width = bitmap.shape
        boxes, scores = [], []

        contours = geo.find_contours(bitmap.astype(np.uint8))
        for contour in contours[:self.max_candidates]:
            contour = np.asarray(contour, dtype=np.float64)
            epsilon = 0.005 * geo.polygon_perimeter(contour)
            points = geo.approx_poly_dp(contour, epsilon)
            if points.shape[0] < 4:
                continue
            score = self.box_score_fast(pred, contour)
            if self.box_thresh > score:
                continue
            expanded = self.unclip(points, unclip_ratio=self.unclip_ratio)
            if len(expanded) != 1:
                continue
            box = np.asarray(expanded[0], dtype=np.float64).reshape(-1, 2)
            _, (w, h) = geo.min_area_rect(box)
            if min(w, h) < self.min_size + 2:
                continue
            box[:, 0] = np.clip(np.round(box[:, 0] / width * dest_width), 0,
                                dest_width)
            box[:, 1] = np.clip(np.round(box[:, 1] / height * dest_height), 0,
                                dest_height)
            boxes.append(box.astype(np.int64))
            scores.append(score)
        return boxes, scores

    def boxes_from_bitmap(self, pred, bitmap, dest_width, dest_height):
        """``src/postprocess.py:106-148``."""
        assert bitmap.ndim == 2
        height, width = bitmap.shape
        contours = geo.find_contours(bitmap.astype(np.uint8))
        num_contours = min(len(contours), self.max_candidates)
        boxes = np.zeros((num_contours, 4, 2), dtype=np.int16)
        scores = np.zeros((num_contours,), dtype=np.float32)

        for index in range(num_contours):
            contour = np.asarray(contours[index], dtype=np.float64)
            corners, (w, h) = geo.min_area_rect(contour)
            if min(w, h) < self.min_size:
                continue
            points = np.array(order_rect_points(corners))
            score = self.box_score_fast(pred, contour)
            if self.box_thresh > score:
                continue
            expanded = self.unclip(points, unclip_ratio=self.unclip_ratio)
            if not expanded:
                continue
            box_poly = np.asarray(expanded[0], dtype=np.float64)
            corners2, (w2, h2) = geo.min_area_rect(box_poly)
            if min(w2, h2) < self.min_size + 2:
                continue
            box = np.array(order_rect_points(corners2))
            box[:, 0] = np.clip(np.round(box[:, 0] / width * dest_width), 0,
                                dest_width)
            box[:, 1] = np.clip(np.round(box[:, 1] / height * dest_height), 0,
                                dest_height)
            boxes[index, :, :] = box.astype(np.int16)
            scores[index] = score
        return boxes, scores

    def unclip(self, box, unclip_ratio: float = 1.5):
        """``src/postprocess.py:150-156``: dilate by d = A·ratio/L."""
        return _unclip(box, unclip_ratio)

    def box_score_fast(self, bitmap: np.ndarray, box: np.ndarray) -> float:
        """Mean prob inside the contour's filled polygon within its bbox
        (``src/postprocess.py:186-198``)."""
        h, w = bitmap.shape[:2]
        box = np.asarray(box, dtype=np.float64).copy()
        xmin = int(np.clip(np.floor(box[:, 0].min()), 0, w - 1))
        xmax = int(np.clip(np.ceil(box[:, 0].max()), 0, w - 1))
        ymin = int(np.clip(np.floor(box[:, 1].min()), 0, h - 1))
        ymax = int(np.clip(np.ceil(box[:, 1].max()), 0, h - 1))
        mask = np.zeros((ymax - ymin + 1, xmax - xmin + 1), dtype=np.float32)
        box[:, 0] -= xmin
        box[:, 1] -= ymin
        geo.fill_poly(mask, box, 1.0)
        denom = mask.sum()
        if denom == 0:
            return 0.0
        window = bitmap[ymin:ymax + 1, xmin:xmax + 1]
        return float((window * mask).sum() / denom)
