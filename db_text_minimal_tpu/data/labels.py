"""DB ground-truth map generation: shrink masks + border (threshold) maps.

Rebuild of the label-generation half of the reference pipeline:
- polygon shrink by paper eq. 6 ``d = A(1−r²)/L`` with Vatti/Clipper round
  joins (``src/data_loaders.py:99-141``), producing the prob map and the
  supervision mask (ignored / too-small / failed-shrink polys are masked out);
- ``draw_thresh_map`` (``src/db_transforms.py:8-63``): polygon dilated by d,
  per-pixel distance-to-boundary field inside the dilated bbox, fused to the
  canvas with max; thresh mask (text_area_map) = dilated polys filled.

The per-edge distance loop — the reference's CPU hot spot (SURVEY.md §3.1) —
runs in the C++ geometry library.
"""

from __future__ import annotations

import numpy as np

from ..ops import geometry as geo


def shrink_polygon(poly: np.ndarray, shrink_ratio: float = 0.4):
    """Paper eq. 6 shrink (``src/data_loaders.py:115-131``). Returns the
    shrunk polygon (int array) or None when the offset collapses."""
    area = geo.polygon_area(poly)
    length = geo.polygon_perimeter(poly)
    if area < 1e-6 or length < 1e-6:
        return None
    distance = area * (1 - np.power(shrink_ratio, 2)) / length
    shrinked = geo.offset_polygon(poly, -distance)
    if not shrinked:
        return None
    first = np.asarray(shrinked[0]).reshape(-1, 2)
    if first.shape[0] <= 2 or not geo.polygon_is_simple(first):
        return None
    return first


def draw_thresh_map(poly, canvas: np.ndarray, mask: np.ndarray,
                    shrink_ratio: float = 0.4) -> None:
    """``src/db_transforms.py:8-63``: in-place update of the threshold canvas
    (normalized inverse distance, max-fused) and the thresh-supervision mask
    (dilated polygon filled with 1)."""
    polygon = np.array(poly, dtype=np.float64)
    assert polygon.ndim == 2 and polygon.shape[1] == 2
    area = geo.polygon_area(polygon)
    length = geo.polygon_perimeter(polygon)
    if area <= 0 or length <= 0:
        return
    distance = area * (1 - np.power(shrink_ratio, 2)) / length
    padded = geo.offset_polygon(polygon, distance)
    if not padded:
        return
    padded_polygon = np.asarray(padded[0], dtype=np.float64)
    geo.fill_poly(mask, padded_polygon, 1.0)

    xmin = int(padded_polygon[:, 0].min())
    xmax = int(padded_polygon[:, 0].max())
    ymin = int(padded_polygon[:, 1].min())
    ymax = int(padded_polygon[:, 1].max())
    width = xmax - xmin + 1
    height = ymax - ymin + 1

    shifted = polygon.copy()
    shifted[:, 0] -= xmin
    shifted[:, 1] -= ymin

    # distance_map = min over edges of clipped normalized distance
    distance_map = geo.border_distance_field(shifted, height, width, distance)

    xmin_valid = min(max(0, xmin), canvas.shape[1] - 1)
    xmax_valid = min(max(0, xmax), canvas.shape[1] - 1)
    ymin_valid = min(max(0, ymin), canvas.shape[0] - 1)
    ymax_valid = min(max(0, ymax), canvas.shape[0] - 1)
    canvas[ymin_valid:ymax_valid + 1, xmin_valid:xmax_valid + 1] = np.fmax(
        1 - distance_map[ymin_valid - ymin:ymax_valid - ymin + 1,
                         xmin_valid - xmin:xmax_valid - xmin + 1],
        canvas[ymin_valid:ymax_valid + 1, xmin_valid:xmax_valid + 1])


def make_gt_maps(anns, image_size: int, ignore_tags: list[str],
                 min_text_size: int = 8, shrink_ratio: float = 0.4,
                 thresh_min: float = 0.3, thresh_max: float = 0.7):
    """Build the four GT maps for one sample
    (``src/data_loaders.py:86-149``). Returns
    (prob_map, supervision_mask, thresh_map, text_area_map, per_ann_ignore).
    """
    gt = np.zeros((image_size, image_size), dtype=np.float32)
    mask = np.ones((image_size, image_size), dtype=np.float32)
    thresh_map = np.zeros((image_size, image_size), dtype=np.float32)
    thresh_mask = np.zeros((image_size, image_size), dtype=np.float32)

    ignore_flags = []
    for ann in anns:
        poly = np.array(ann["poly"])
        height = poly[:, 1].max() - poly[:, 1].min()
        width = poly[:, 0].max() - poly[:, 0].min()
        if (geo.polygon_area(poly) < 1
                or min(height, width) < min_text_size
                or ann["text"] in ignore_tags):
            ignore_flags.append(True)
            geo.fill_poly(mask, poly.astype(np.float64), 0.0)
            continue
        shrinked = shrink_polygon(poly, shrink_ratio)
        if shrinked is None:
            ignore_flags.append(True)
            geo.fill_poly(mask, poly.astype(np.float64), 0.0)
            continue
        ignore_flags.append(False)
        geo.fill_poly(gt, shrinked.astype(np.float64), 1.0)
        draw_thresh_map(ann["poly"], thresh_map, thresh_mask,
                        shrink_ratio=shrink_ratio)

    thresh_map = thresh_map * (thresh_max - thresh_min) + thresh_min
    return gt, mask, thresh_map, thresh_mask, ignore_flags
