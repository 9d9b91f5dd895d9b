"""Postprocess + metrics tests: synthetic prob-map round trips, evaluator
semantics on constructed match scenarios (golden cases from the protocol
definitions), and RunningScore math."""

import numpy as np
import pytest

from db_text_minimal_tpu.ops import geometry as geo
from db_text_minimal_tpu.postprocess import SegDetectorRepresenter
from db_text_minimal_tpu.metrics import (AverageMeter,
                                         DetectionDetEvalEvaluator,
                                         DetectionIoUEvaluator, QuadMetric,
                                         RunningScore, cal_text_score,
                                         polygon_iou)


def _prob_map_with_boxes(boxes, size=160, hi=0.9):
    """Synthesize a prob map resembling a DB shrink-map prediction."""
    pred = np.full((size, size), 0.05, np.float32)
    for box in boxes:
        geo.fill_poly(pred, np.asarray(box, np.float64), hi)
    return pred


BOXES = [
    [(20, 30), (80, 30), (80, 55), (20, 55)],
    [(100, 90), (150, 95), (148, 120), (98, 115)],
]


def test_polygons_from_bitmap_roundtrip():
    pred = _prob_map_with_boxes(BOXES)
    rep = SegDetectorRepresenter(thresh=0.3, box_thresh=0.5)
    batch = {"shape": [(160, 160)]}
    boxes_batch, scores_batch = rep(batch, pred[None, :, :, None],
                                    is_output_polygon=True)
    boxes, scores = boxes_batch[0], scores_batch[0]
    assert len(boxes) == 2
    assert all(s > 0.8 for s in scores)
    # each detected polygon contains its source box (unclip only dilates)
    for src in BOXES:
        src_area = geo.polygon_area(src)
        best = max(geo.intersection_area(src, b) / src_area for b in boxes)
        assert best > 0.95


def test_boxes_from_bitmap_rect_mode():
    pred = _prob_map_with_boxes(BOXES)
    rep = SegDetectorRepresenter(thresh=0.3, box_thresh=0.5)
    boxes_batch, scores_batch = rep({"shape": [(160, 160)]},
                                    pred[None, :, :, None],
                                    is_output_polygon=False)
    boxes = boxes_batch[0]
    kept = boxes[np.abs(boxes).sum(axis=(1, 2)) > 0]
    assert kept.shape[1:] == (4, 2)
    assert len(kept) == 2


def test_postprocess_scales_to_dest_size():
    pred = _prob_map_with_boxes(BOXES)
    rep = SegDetectorRepresenter(thresh=0.3, box_thresh=0.5)
    boxes_batch, _ = rep({"shape": [(320, 320)]}, pred[None, :, :, None],
                         is_output_polygon=True)
    all_pts = np.concatenate(boxes_batch[0])
    assert all_pts.max() > 160  # coordinates rescaled to 320-space


def test_low_score_regions_rejected():
    pred = _prob_map_with_boxes(BOXES, hi=0.4)  # below box_thresh
    rep = SegDetectorRepresenter(thresh=0.3, box_thresh=0.7)
    boxes_batch, _ = rep({"shape": [(160, 160)]}, pred[None, :, :, None],
                         is_output_polygon=True)
    assert len(boxes_batch[0]) == 0


# ---------------------------------------------------------------------------
# IoU evaluator (protocol golden cases from src/iou.py:248-273 doc examples)
# ---------------------------------------------------------------------------

UNIT = [(0, 0), (1, 0), (1, 1), (0, 1)]


def test_iou_evaluator_doc_example():
    gts = [{"points": UNIT, "ignore": False},
           {"points": [(2, 2), (3, 2), (3, 3), (2, 3)], "ignore": True}]
    preds = [{"points": [(0.1, 0.1), (1, 0), (1, 1), (0, 1)],
              "ignore": False}]
    ev = DetectionIoUEvaluator()
    r = ev.evaluate_image(gts, preds)
    assert r["detMatched"] == 1
    assert r["gtCare"] == 1 and r["detCare"] == 1
    assert r["precision"] == 1.0 and r["recall"] == 1.0
    combined = ev.combine_results([r])
    assert combined["hmean"] == 1.0


def test_iou_dont_care_pred_filtered():
    gts = [{"points": UNIT, "ignore": True}]
    preds = [{"points": [(0, 0), (1, 0), (1, 1), (0, 1)], "ignore": False}]
    r = DetectionIoUEvaluator().evaluate_image(gts, preds)
    # pred overlaps ignored GT -> dropped from detCare; empty-care image
    assert r["detCare"] == 0 and r["gtCare"] == 0
    assert r["recall"] == 1.0 and r["precision"] == 1.0


def test_iou_below_threshold_no_match():
    gts = [{"points": UNIT, "ignore": False}]
    preds = [{"points": [(0.8, 0.8), (1.8, 0.8), (1.8, 1.8), (0.8, 1.8)],
              "ignore": False}]
    r = DetectionIoUEvaluator(iou_constraint=0.5).evaluate_image(gts, preds)
    assert r["detMatched"] == 0
    assert r["precision"] == 0.0 and r["recall"] == 0.0


def test_polygon_iou_value():
    a = [(0, 0), (2, 0), (2, 2), (0, 2)]
    b = [(1, 1), (3, 1), (3, 3), (1, 3)]
    assert polygon_iou(a, b) == pytest.approx(1.0 / 7.0, rel=1e-6)


# ---------------------------------------------------------------------------
# DetEval evaluator
# ---------------------------------------------------------------------------

def _sq(x, y, w, h):
    return [(x, y), (x + w, y), (x + w, y + h), (x, y + h)]


def test_deteval_one_to_one():
    gts = [{"points": _sq(0, 0, 10, 10), "ignore": False}]
    preds = [{"points": _sq(0.5, 0.5, 10, 10), "ignore": False}]
    ev = DetectionDetEvalEvaluator()
    r = ev.evaluate_image(gts, preds)
    assert r["recallAccum"] == 1.0 and r["precisionAccum"] == 1.0
    assert r["pairs"][0]["type"] == "OO"


def test_deteval_one_to_many_split():
    # one GT word detected as two half boxes: recall 0.8 credit
    gts = [{"points": _sq(0, 0, 20, 10), "ignore": False}]
    preds = [{"points": _sq(0, 0, 10, 10), "ignore": False},
             {"points": _sq(10, 0, 10, 10), "ignore": False}]
    r = DetectionDetEvalEvaluator().evaluate_image(gts, preds)
    om = [p for p in r["pairs"] if p["type"] == "OM"]
    assert len(om) == 1
    assert r["recallAccum"] == pytest.approx(0.8)
    assert r["precisionAccum"] == pytest.approx(1.6)  # 0.8 × 2 dets


def test_deteval_many_to_one_merge():
    # two GT words covered by one large det box
    gts = [{"points": _sq(0, 0, 10, 10), "ignore": False},
           {"points": _sq(12, 0, 10, 10), "ignore": False}]
    preds = [{"points": _sq(0, 0, 22, 10), "ignore": False}]
    r = DetectionDetEvalEvaluator().evaluate_image(gts, preds)
    mo = [p for p in r["pairs"] if p["type"] == "MO"]
    assert len(mo) == 1
    assert r["recallAccum"] == pytest.approx(2.0)   # 1.0 × 2 gts
    assert r["precisionAccum"] == pytest.approx(1.0)


def test_deteval_combine():
    ev = DetectionDetEvalEvaluator()
    gts = [{"points": _sq(0, 0, 10, 10), "ignore": False}]
    preds = [{"points": _sq(0, 0, 10, 10), "ignore": False}]
    r1 = ev.evaluate_image(gts, preds)
    r2 = ev.evaluate_image(gts, [])
    combined = ev.combine_results([r1, r2])
    assert combined["recall"] == pytest.approx(0.5)
    assert combined["precision"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# pixel metrics + QuadMetric
# ---------------------------------------------------------------------------

def test_running_score_perfect_prediction():
    rs = RunningScore(2)
    labels = np.array([[0, 1], [1, 0]])
    rs.update([labels], [labels])
    scores, _ = rs.get_scores()
    assert scores["Overall Acc"] == pytest.approx(1.0, abs=1e-3)
    assert scores["Mean IoU"] == pytest.approx(1.0, abs=1e-3)


def test_cal_text_score():
    rs = RunningScore(2)
    pred = np.array([[[0.9, 0.1], [0.8, 0.2]]])
    gt = np.array([[[1.0, 0.0], [1.0, 0.0]]])
    mask = np.ones_like(gt)
    scores = cal_text_score(pred, gt, mask, rs, thresh=0.5)
    assert scores["Overall Acc"] == pytest.approx(1.0, abs=1e-3)


def test_quad_metric_end_to_end():
    metric = QuadMetric()
    batch = {"anns": [[_sq(10, 10, 50, 20)]], "ignore_tags": [[False]]}
    output = ([[np.array(_sq(11, 11, 50, 20))]], [[0.95]])
    raw = metric.validate_measure(batch, output)
    gathered = metric.gather_measure([raw])
    assert gathered["fmeasure"].avg == pytest.approx(1.0, rel=1e-3)


def test_average_meter():
    m = AverageMeter()
    m.update(1.0, n=2)
    m.update(4.0, n=1)
    assert m.avg == pytest.approx(2.0)


# ---------------------------------------------------------------------------
# Device-assisted polygon mode (VERDICT r2 ask #4)

def _blobby_map(seed, size=128, n=3):
    rng = np.random.RandomState(seed)
    pred = rng.rand(size, size).astype(np.float32) * 0.2
    for _ in range(n):
        w = rng.randint(18, 60)
        h = rng.randint(10, 30)
        x = rng.randint(1, size - w - 1)
        y = rng.randint(1, size - h - 1)
        poly = np.array([[x, y], [x + w, y + rng.randint(-4, 5)],
                         [x + w, y + h], [x, y + h + rng.randint(-4, 5)]],
                        np.float64)
        m = np.zeros((size, size), np.float32)
        geo.fill_poly(m, poly, 1.0)
        pred[m > 0] = rng.uniform(0.45, 0.95)
        if rng.rand() < 0.5 and w > 30 and h > 16:
            hole = np.array([[x + 8, y + 5], [x + 16, y + 5],
                             [x + 16, y + 11], [x + 8, y + 11]], np.float64)
            hm = np.zeros((size, size), np.float32)
            geo.fill_poly(hm, hole, 1.0)
            pred[hm > 0] = 0.1
    return pred


def test_device_poly_matches_host_polygon_mode():
    """DevicePolyRepresenter (device CC + bit-packed bitmap + hole-filled
    scores, host contours/DP/unclip) must reproduce the host
    ``polygons_from_bitmap`` output — polygons AND scores — on maps with
    holes and near-gate scores."""
    from db_text_minimal_tpu.postprocess import DevicePolyRepresenter

    maps = np.stack([_blobby_map(s) for s in range(6)])
    batch = {"shape": [(128, 128)] * len(maps)}
    host = SegDetectorRepresenter(thresh=0.3, box_thresh=0.5)
    dev = DevicePolyRepresenter(thresh=0.3, box_thresh=0.5)
    hb, hs = host(batch, maps[..., None], is_output_polygon=True)
    import jax.numpy as jnp

    db, ds = dev(batch, jnp.asarray(maps), is_output_polygon=True)
    for i in range(len(maps)):
        assert len(hb[i]) == len(db[i]), f"img {i}: count mismatch"
        for a, b in zip(hb[i], db[i]):
            assert a.shape == b.shape
            assert np.abs(a - b).max() == 0
        np.testing.assert_allclose(hs[i], ds[i], atol=2e-3)


def test_device_poly_rescales_to_dest():
    from db_text_minimal_tpu.postprocess import DevicePolyRepresenter
    import jax.numpy as jnp

    pred = _prob_map_with_boxes(BOXES)
    batch = {"shape": [(320, 480)]}
    dev = DevicePolyRepresenter(thresh=0.3, box_thresh=0.5)
    boxes, scores = dev(batch, jnp.asarray(pred[None]),
                        is_output_polygon=True)
    assert len(boxes[0]) == 2
    for b in boxes[0]:
        assert b[:, 0].max() <= 480 and b[:, 1].max() <= 320


def test_hole_filled_device_score_matches_box_score_fast():
    """The device score support (component + enclosed holes) equals the
    host's filled-outer-contour support (``src/postprocess.py:186-198``) —
    the round-2 divergence suspect."""
    from db_text_minimal_tpu.ops.pallas.cc import device_poly_stats
    import jax.numpy as jnp

    pred = np.full((96, 96), 0.05, np.float32)
    m = np.zeros((96, 96), np.float32)
    geo.fill_poly(m, np.array([[10, 10], [80, 12], [78, 50], [12, 48]],
                              np.float64), 1.0)
    pred[m > 0] = 0.7
    hm = np.zeros((96, 96), np.float32)
    geo.fill_poly(hm, np.array([[30, 20], [50, 20], [50, 35], [30, 35]],
                               np.float64), 1.0)
    pred[hm > 0] = 0.08   # interior hole, below thresh
    _, _, scores, valid = device_poly_stats(jnp.asarray(pred[None]),
                                            thresh=0.3)
    dev_score = float(np.asarray(scores)[0][np.asarray(valid)[0]][0])
    rep = SegDetectorRepresenter(thresh=0.3, box_thresh=0.5)
    contour = geo.find_contours((pred > 0.3).astype(np.uint8))[0]
    host_score = rep.box_score_fast(pred, np.asarray(contour, np.float64))
    assert abs(dev_score - host_score) < 2e-3
    # and both are far below the component-only mean (0.7)
    assert dev_score < 0.65


def test_device_poly_non_multiple_of_8_width():
    """device_poly_stats bit-packs rows padded to the next byte boundary,
    so non-multiple-of-8 map widths (e.g. 100) work and match the host
    polygon path (the unpadded reshape raised at trace time)."""
    from db_text_minimal_tpu.postprocess import DevicePolyRepresenter
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    m = np.zeros((100, 100), np.float32)
    m[20:40, 10:90] = rng.uniform(0.7, 0.95, (20, 80))
    m[60:75, 30:61] = rng.uniform(0.6, 0.9, (15, 31))
    maps = m[None]
    batch = {"shape": [(100, 100)]}
    host = SegDetectorRepresenter(thresh=0.3, box_thresh=0.5)
    dev = DevicePolyRepresenter(thresh=0.3, box_thresh=0.5)
    hb, hs = host(batch, maps[..., None], is_output_polygon=True)
    db, ds = dev(batch, jnp.asarray(maps), is_output_polygon=True)
    assert len(hb[0]) == len(db[0]) and len(db[0]) >= 2
    for a, b in zip(hb[0], db[0]):
        assert np.abs(a - b).max() == 0
    np.testing.assert_allclose(hs[0], ds[0], atol=2e-3)


def test_device_score_nested_component_in_hole():
    """A ring component with ANOTHER component nested inside its hole:
    the hole must route to the ENCLOSING ring (min adjacent slot), not
    the nested blob — max-routing corrupted the nested blob's score with
    hole pixels and inverted the box_thresh keep decision vs host."""
    from db_text_minimal_tpu.postprocess import (DeviceBoxRepresenter,
                                                 SegDetectorRepresenter)
    import jax.numpy as jnp

    m = np.full((128, 128), 0.05, np.float32)
    # ring A at prob .55: 60x60 outer, 36x36 hole
    m[30:90, 30:90] = 0.55
    m[42:78, 42:78] = 0.05
    # nested blob B at prob .95 inside the hole
    m[54:66, 54:66] = 0.95
    batch = {"shape": [(128, 128)]}
    host = SegDetectorRepresenter(thresh=0.3, box_thresh=0.7)
    dev = DeviceBoxRepresenter(thresh=0.3, box_thresh=0.7)
    hb, hs = host(batch, m[None, ..., None], is_output_polygon=False)
    db, ds = dev(batch, jnp.asarray(m[None]), is_output_polygon=False)
    # host: A's filled-contour mean ~.42 (rejected -> zero-padded entry),
    # B .95 (kept)
    host_kept = [s for s in np.asarray(hs[0]).tolist() if s > 0]
    assert host_kept == pytest.approx([0.95], abs=0.01), hs[0]
    # device must agree: exactly one kept box, the nested blob, score ~.95
    assert len(db[0]) == 1, (len(db[0]), ds[0])
    assert ds[0][0] > 0.9, ds[0]
    center = np.asarray(db[0][0], float).mean(axis=0)
    np.testing.assert_allclose(center, [60, 60], atol=2.0)


def test_hole_sealed_by_diagonal_strokes_counts_toward_device_score():
    """Complement-connectivity fix (advisor r3): a hole enclosed only by
    1-px DIAGONAL strokes is 8-connected to the outside background, so an
    8-connected background pass marked it border-touching and excluded it
    from the device score — while the host's filled-outer-contour mean
    (``src/postprocess.py:186-198``) includes it. With the 4-connected
    background pass the two agree."""
    from db_text_minimal_tpu.ops.pallas.cc import device_poly_stats
    import jax.numpy as jnp

    pred = np.full((64, 64), 0.05, np.float32)
    cy, cx, r = 32, 32, 12
    for i in range(r + 1):  # 1-px diamond ring: pure diagonal steps
        for sy, sx in ((1, 1), (1, -1), (-1, 1), (-1, -1)):
            y, x = cy - r * sy + i * sy, cx + i * sx
            pred[y, x] = 0.8
    # interior of the diamond is the hole (below thresh)
    assert pred[cy, cx] < 0.3

    _, _, scores, valid = device_poly_stats(jnp.asarray(pred[None]),
                                            thresh=0.3)
    vals = np.asarray(scores)[0][np.asarray(valid)[0]]
    assert len(vals) == 1
    dev_score = float(vals[0])

    rep = SegDetectorRepresenter(thresh=0.3, box_thresh=0.1)
    contour = geo.find_contours((pred > 0.3).astype(np.uint8))[0]
    host_score = rep.box_score_fast(pred, np.asarray(contour, np.float64))
    # hole pixels (0.05) pull the mean far below the ring value (0.8);
    # the device mean must include them like the host's filled contour
    assert host_score < 0.5
    assert abs(dev_score - host_score) < 2e-2
