"""Behavioral parity against the REFERENCE'S OWN label-generation and
postprocess code, imported with pyclipper/shapely/imgaug shims backed by our
C++ geometry library (SURVEY.md §7 hard parts (a) and (e)).

- draw_thresh_map: the reference's exact numpy implementation vs ours on the
  same polygons (both use our offsetting through the shim, so this isolates
  the distance-field + canvas math *plus* proves our offsets feed it
  compatibly).
- SegDetectorRepresenter: random synthetic prob maps through the reference's
  cv2/pyclipper pipeline vs our first-party pipeline; rect-mode boxes and
  scores must agree to raster tolerance.
"""

import os
import sys
import types

import numpy as np
import pytest

from db_text_minimal_tpu.ops import geometry as geo

REFERENCE = "/root/reference/src"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference checkout not available")


# --------------------------------------------------------------------------
# shims
# --------------------------------------------------------------------------

class _ShimPolygon:
    def __init__(self, points):
        self._pts = np.asarray(points, dtype=np.float64)

    def buffer(self, _):
        return self

    @property
    def is_valid(self):
        return len(self._pts) >= 3 and geo.polygon_is_simple(self._pts)

    @property
    def is_simple(self):
        return self.is_valid

    @property
    def area(self):
        return geo.polygon_area(self._pts)

    @property
    def length(self):
        return geo.polygon_perimeter(self._pts)

    def intersection(self, other):
        class A:
            area = geo.intersection_area(self._pts, other._pts)
        return A()

    def union(self, other):
        class A:
            area = geo.union_area(self._pts, other._pts)
        return A()


class _ShimPyclipperOffset:
    """pyclipper.PyclipperOffset backed by geo.offset_polygon."""

    def __init__(self):
        self._path = None

    def AddPath(self, path, jt, et):
        self._path = np.asarray(path, dtype=np.float64)

    def Execute(self, delta):
        loops = geo.offset_polygon(self._path, float(delta))
        return [np.asarray(l).tolist() for l in loops]


@pytest.fixture(scope="module")
def reference_modules():
    shims = {}
    shapely = types.ModuleType("shapely")
    shapely_geometry = types.ModuleType("shapely.geometry")
    shapely_geometry.Polygon = _ShimPolygon
    shapely.geometry = shapely_geometry
    shims["shapely"] = shapely
    shims["shapely.geometry"] = shapely_geometry

    pyclipper = types.ModuleType("pyclipper")
    pyclipper.PyclipperOffset = _ShimPyclipperOffset
    pyclipper.JT_ROUND = 2
    pyclipper.ET_CLOSEDPOLYGON = 4
    shims["pyclipper"] = pyclipper

    imgaug = types.ModuleType("imgaug")  # only touched by transform()
    imgaug.Keypoint = object
    imgaug.KeypointsOnImage = object
    shims["imgaug"] = imgaug

    saved = {k: sys.modules.get(k) for k in shims}
    sys.modules.update(shims)
    sys.path.insert(0, REFERENCE)
    np.int = int  # the reference predates numpy 1.24 (np.int removal)
    try:
        import importlib

        ref_transforms = importlib.import_module("db_transforms")
        ref_postprocess = importlib.import_module("postprocess")
        yield ref_transforms, ref_postprocess
    finally:
        del np.int
        sys.path.remove(REFERENCE)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


# --------------------------------------------------------------------------
# label generation parity
# --------------------------------------------------------------------------

def test_draw_thresh_map_matches_reference_code(rng, reference_modules):
    from db_text_minimal_tpu.data.labels import draw_thresh_map

    ref_transforms, _ = reference_modules
    for trial in range(10):
        x, y = rng.rand(2) * 100 + 20
        w, h = rng.rand(2) * 80 + 30
        jitter = rng.rand(4, 2) * 6
        poly = (np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]])
                + jitter)
        canvas_ref = np.zeros((256, 256), np.float32)
        mask_ref = np.zeros((256, 256), np.float32)
        ref_transforms.draw_thresh_map(poly.tolist(), canvas_ref, mask_ref,
                                       shrink_ratio=0.4)
        canvas_ours = np.zeros((256, 256), np.float32)
        mask_ours = np.zeros((256, 256), np.float32)
        draw_thresh_map(poly.tolist(), canvas_ours, mask_ours,
                        shrink_ratio=0.4)
        # same distance-field values (identical formula, C++ vs numpy)
        np.testing.assert_allclose(canvas_ours, canvas_ref, atol=1e-4)
        # masks rasterized by different fillPoly implementations: near-equal
        diff = np.abs(mask_ours - mask_ref).mean()
        assert diff < 0.01, (trial, diff)


# --------------------------------------------------------------------------
# postprocess parity (rect mode)
# --------------------------------------------------------------------------

def _synthetic_pred(rng, size=160, n_boxes=3):
    pred = np.full((size, size), 0.05, np.float32)
    boxes = []
    tries = 0
    while len(boxes) < n_boxes and tries < 30:
        tries += 1
        x, y = rng.randint(5, size - 60, 2)
        w, h = rng.randint(25, 55), rng.randint(12, 30)
        if any(not (x + w < bx - 4 or x > bx + bw + 4 or y + h < by - 4
                    or y > by + bh + 4) for bx, by, bw, bh in boxes):
            continue
        boxes.append((x, y, w, h))
        geo.fill_poly(pred, np.array([(x, y), (x + w, y), (x + w, y + h),
                                      (x, y + h)], float), 0.9)
    return pred, boxes


def test_rect_postprocess_matches_reference_code(rng, reference_modules):
    import torch

    from db_text_minimal_tpu.postprocess import SegDetectorRepresenter

    _, ref_postprocess = reference_modules
    theirs = ref_postprocess.SegDetectorRepresenter(thresh=0.3,
                                                    box_thresh=0.5)
    ours = SegDetectorRepresenter(thresh=0.3, box_thresh=0.5)
    for trial in range(8):
        pred, _ = _synthetic_pred(rng)
        batch = {"shape": [(160, 160)]}
        # reference consumes NCHW torch tensors (postprocess.py:33-36)
        t_pred = torch.from_numpy(pred[None, None])
        their_boxes, their_scores = theirs(batch, t_pred,
                                           is_output_polygon=False)
        our_boxes, our_scores = ours(batch, pred[None, :, :, None],
                                     is_output_polygon=False)
        tb = np.asarray(their_boxes[0])
        ob = np.asarray(our_boxes[0])
        tb = tb[np.abs(tb).reshape(len(tb), -1).sum(1) > 0]
        ob = ob[np.abs(ob).reshape(len(ob), -1).sum(1) > 0]
        assert len(tb) == len(ob), trial
        # match each reference box to ours by IoU
        for box in tb:
            best = max(
                (geo.intersection_area(box, b)
                 / max(geo.union_area(box, b), 1e-9) for b in ob),
                default=0.0)
            assert best > 0.9, (trial, box.tolist(), ob.tolist())
        np.testing.assert_allclose(
            sorted(np.asarray(their_scores[0])[np.asarray(
                their_scores[0]) > 0]),
            sorted(np.asarray(our_scores[0])[np.asarray(our_scores[0]) > 0]),
            atol=0.05)


def test_polygon_postprocess_close_to_reference_code(rng,
                                                     reference_modules):
    import torch

    from db_text_minimal_tpu.postprocess import SegDetectorRepresenter

    _, ref_postprocess = reference_modules
    theirs = ref_postprocess.SegDetectorRepresenter(thresh=0.3,
                                                    box_thresh=0.5)
    ours = SegDetectorRepresenter(thresh=0.3, box_thresh=0.5)
    pred, _ = _synthetic_pred(rng, n_boxes=2)
    batch = {"shape": [(160, 160)]}
    their_boxes, _ = theirs(batch, torch.from_numpy(pred[None, None]),
                            is_output_polygon=True)
    our_boxes, _ = ours(batch, pred[None, :, :, None],
                        is_output_polygon=True)
    assert len(their_boxes[0]) == len(our_boxes[0])
    for t_poly in their_boxes[0]:
        best = max((geo.intersection_area(t_poly.reshape(-1, 2), o)
                    / max(geo.union_area(t_poly.reshape(-1, 2), o), 1e-9)
                    for o in our_boxes[0]), default=0.0)
        assert best > 0.85
