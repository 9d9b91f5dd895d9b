"""Cross-validation of the IoU-Pascal and DetEval evaluators against the
REFERENCE implementations, run by injecting a minimal shapely shim backed by
our C++ geometry library (shapely itself is not installed). Random scenes
must produce identical per-image and combined metrics — the strongest
available evidence of identical match semantics (SURVEY.md §4 plan (e))."""

import os
import sys
import types

import numpy as np
import pytest

from db_text_minimal_tpu.metrics import (DetectionDetEvalEvaluator,
                                         DetectionIoUEvaluator)
from db_text_minimal_tpu.ops import geometry as geo

REFERENCE = "/root/reference/src"

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE),
                                reason="reference checkout not available")


class _ShimPolygon:
    """Just enough of shapely.geometry.Polygon for iou.py / deteval.py:
    area, buffer(0) → self, is_valid/is_simple, intersection/union areas."""

    def __init__(self, points):
        self._pts = np.asarray(points, dtype=np.float64)

    # reference calls Polygon(points).buffer(0) before validity/boolean ops
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
        return _Area(geo.intersection_area(self._pts, other._pts))

    def union(self, other):
        return _Area(geo.union_area(self._pts, other._pts))


class _Area:
    def __init__(self, area):
        self.area = area


@pytest.fixture(scope="module")
def reference_evaluators():
    shapely = types.ModuleType("shapely")
    shapely_geometry = types.ModuleType("shapely.geometry")
    shapely_geometry.Polygon = _ShimPolygon
    shapely.geometry = shapely_geometry
    saved = {k: sys.modules.get(k) for k in ("shapely", "shapely.geometry")}
    sys.modules["shapely"] = shapely
    sys.modules["shapely.geometry"] = shapely_geometry
    sys.path.insert(0, REFERENCE)
    try:
        import importlib

        ref_iou = importlib.import_module("iou")
        ref_deteval = importlib.import_module("deteval")
        yield ref_iou, ref_deteval
    finally:
        sys.path.remove(REFERENCE)
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _random_scene(rng, n_gt, n_pred, with_ignores=True):
    def poly():
        x, y = rng.rand(2) * 80
        w, h = rng.rand(2) * 30 + 5
        jitter = rng.rand(4, 2) * 2
        base = np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]])
        return [tuple(p) for p in (base + jitter).tolist()]

    gts = [{"points": poly(), "text": "x",
            "ignore": bool(with_ignores and rng.rand() < 0.3)}
           for _ in range(n_gt)]
    preds = [{"points": poly(), "text": "y", "ignore": False}
             for _ in range(n_pred)]
    return gts, preds


def test_iou_evaluator_matches_reference(rng, reference_evaluators):
    ref_iou, _ = reference_evaluators
    theirs = ref_iou.DetectionIoUEvaluator(iou_constraint=0.4,
                                           area_precision_constraint=0.8)
    ours = DetectionIoUEvaluator(iou_constraint=0.4,
                                 area_precision_constraint=0.8)
    their_results, our_results = [], []
    for trial in range(25):
        gts, preds = _random_scene(rng, rng.randint(0, 6),
                                   rng.randint(0, 6))
        r_t = theirs.evaluate_image(gts, preds)
        r_o = ours.evaluate_image(gts, preds)
        for key in ("precision", "recall", "hmean", "detMatched", "gtCare",
                    "detCare"):
            assert r_o[key] == pytest.approx(r_t[key], abs=1e-9), (
                trial, key, gts, preds)
        their_results.append(r_t)
        our_results.append(r_o)
    combined_t = theirs.combine_results(their_results)
    combined_o = ours.combine_results(our_results)
    for key in ("precision", "recall", "hmean"):
        assert combined_o[key] == pytest.approx(combined_t[key], abs=1e-12)


def test_deteval_evaluator_matches_reference(rng, reference_evaluators):
    _, ref_deteval = reference_evaluators
    theirs = ref_deteval.DetectionDetEvalEvaluator(
        area_recall_constraint=0.8, area_precision_constraint=0.4)
    ours = DetectionDetEvalEvaluator(area_recall_constraint=0.8,
                                     area_precision_constraint=0.4)
    their_results, our_results = [], []
    for trial in range(25):
        gts, preds = _random_scene(rng, rng.randint(0, 6),
                                   rng.randint(0, 6))
        r_t = theirs.evaluate_image(gts, preds)
        r_o = ours.evaluate_image(gts, preds)
        for key in ("precision", "recall", "hmean", "recallAccum",
                    "precisionAccum", "gtCare", "detCare"):
            assert r_o[key] == pytest.approx(r_t[key], abs=1e-9), (
                trial, key, gts, preds)
        their_results.append(r_t)
        our_results.append(r_o)
    combined_t = theirs.combine_results(their_results)
    combined_o = ours.combine_results(our_results)
    for key in ("precision", "recall", "hmean"):
        assert combined_o[key] == pytest.approx(combined_t[key], abs=1e-12)


def test_deteval_split_merge_scenes_match_reference(reference_evaluators):
    """Targeted one-to-many / many-to-one scenes."""
    _, ref_deteval = reference_evaluators
    theirs = ref_deteval.DetectionDetEvalEvaluator()
    ours = DetectionDetEvalEvaluator()

    def sq(x, y, w, h):
        return [(x, y), (x + w, y), (x + w, y + h), (x, y + h)]

    scenes = [
        # split: one GT covered by two dets
        ([{"points": sq(0, 0, 20, 10), "ignore": False}],
         [{"points": sq(0, 0, 10, 10), "ignore": False},
          {"points": sq(10, 0, 10, 10), "ignore": False}]),
        # merge: two GTs covered by one det
        ([{"points": sq(0, 0, 10, 10), "ignore": False},
          {"points": sq(12, 0, 10, 10), "ignore": False}],
         [{"points": sq(0, 0, 22, 10), "ignore": False}]),
        # ignore interaction
        ([{"points": sq(0, 0, 10, 10), "ignore": True},
          {"points": sq(30, 0, 10, 10), "ignore": False}],
         [{"points": sq(1, 1, 9, 9), "ignore": False},
          {"points": sq(30, 0, 10, 10), "ignore": False}]),
    ]
    for gts, preds in scenes:
        r_t = theirs.evaluate_image(gts, preds)
        r_o = ours.evaluate_image(gts, preds)
        for key in ("recallAccum", "precisionAccum", "hmean"):
            assert r_o[key] == pytest.approx(r_t[key], abs=1e-9), (gts,
                                                                   preds)
