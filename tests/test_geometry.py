"""Unit tests for the first-party C++ geometry library (SURVEY.md §4 plan (a)):
cross-checked against OpenCV where the reference used OpenCV, and against the
reference's own numpy formulas where it used pyclipper/shapely semantics."""

import numpy as np
import pytest

from db_text_minimal_tpu.ops import geometry as geo

SQ = [(0, 0), (10, 0), (10, 10), (0, 10)]


def test_area_perimeter_simple():
    assert geo.polygon_area(SQ) == pytest.approx(100.0)
    assert geo.polygon_perimeter(SQ) == pytest.approx(40.0)
    assert geo.polygon_is_simple(SQ)
    bow = [(0, 0), (10, 10), (10, 0), (0, 10)]
    assert not geo.polygon_is_simple(bow)


def test_intersection_union_area():
    other = [(5, 5), (15, 5), (15, 15), (5, 15)]
    assert geo.intersection_area(SQ, other) == pytest.approx(25.0)
    assert geo.union_area(SQ, other) == pytest.approx(175.0)
    # disjoint
    assert geo.intersection_area(SQ, [(20, 20), (30, 20), (30, 30)]) == 0.0
    # non-convex ∩ non-convex
    lshape = [(0, 0), (20, 0), (20, 10), (10, 10), (10, 30), (0, 30)]
    assert geo.intersection_area(lshape, lshape) == pytest.approx(
        geo.polygon_area(lshape), rel=1e-6)


def test_intersection_area_matches_cv2_rotated_rects(rng):
    cv2 = pytest.importorskip("cv2")
    for _ in range(30):
        a = (rng.rand(4, 2) * 50).astype(np.float64)
        b = (rng.rand(4, 2) * 50).astype(np.float64)
        ha, hb = geo.convex_hull(a), geo.convex_hull(b)
        if len(ha) < 3 or len(hb) < 3:
            continue
        ours = geo.intersection_area(ha, hb)
        ref, _ = cv2.intersectConvexConvex(
            ha.astype(np.float32), hb.astype(np.float32))
        assert ours == pytest.approx(float(ref), abs=1e-3)


def test_min_area_rect_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    for _ in range(50):
        pts = (rng.rand(rng.randint(4, 12), 2) * 100).astype(np.float32)
        (_, (w, h), _) = cv2.minAreaRect(pts)
        _, (w2, h2) = geo.min_area_rect(pts)
        assert w * h == pytest.approx(w2 * h2, rel=1e-4, abs=1e-4)
        # near-ties in area can resolve to different orientations; the min
        # side (the reference's `sside` filter, src/postprocess.py:181) only
        # needs to be close
        assert min(w, h) == pytest.approx(min(w2, h2), rel=0.25, abs=1e-4)


def test_find_contours_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    img = np.zeros((80, 100), np.uint8)
    cv2.circle(img, (30, 40), 12, 1, -1)
    cv2.rectangle(img, (60, 10), (90, 30), 1, -1)
    cv2.circle(img, (70, 60), 8, 1, -1)
    cv2.circle(img, (70, 60), 3, 0, -1)  # hole border as well (RETR_LIST)
    ours = geo.find_contours(img)
    ref, _ = cv2.findContours((img * 255).astype(np.uint8), cv2.RETR_LIST,
                              cv2.CHAIN_APPROX_SIMPLE)
    assert len(ours) == len(ref)

    def pset(c):
        return frozenset(map(tuple, np.asarray(c).reshape(-1, 2).tolist()))

    assert {pset(c) for c in ours} == {pset(c.reshape(-1, 2)) for c in ref}


def test_find_contours_random_blobs(rng):
    cv2 = pytest.importorskip("cv2")
    for _ in range(10):
        img = (rng.rand(60, 60) > 0.85).astype(np.uint8)
        ours = geo.find_contours(img)
        ref, _ = cv2.findContours(img * 255, cv2.RETR_LIST,
                                  cv2.CHAIN_APPROX_SIMPLE)
        assert len(ours) == len(ref)


def test_fill_poly_close_to_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    checked = 0
    for _ in range(100):
        n = rng.randint(3, 9)
        pts = np.round(rng.rand(n, 2) * np.array([90, 70]) + 5)
        if not geo.polygon_is_simple(pts) or geo.polygon_area(pts) < 40:
            continue
        checked += 1
        ours = np.zeros((80, 100), np.float32)
        geo.fill_poly(ours, pts)
        ref = np.zeros((80, 100), np.uint8)
        cv2.fillPoly(ref, [pts.astype(np.int32)], 1)
        inter = np.logical_and(ours > 0, ref > 0).sum()
        union = np.logical_or(ours > 0, ref > 0).sum()
        assert inter / max(union, 1) > 0.95
    assert checked > 10


def test_offset_dilate_area():
    # area(P ⊕ disk(d)) = A + L·d + π·d²  (exact for convex)
    out = geo.offset_polygon(SQ, 2.0, integer=False)
    assert len(out) == 1
    expected = 100 + 40 * 2 + np.pi * 4
    assert geo.polygon_area(out[0]) == pytest.approx(expected, rel=0.02)


def test_offset_shrink_square():
    out = geo.offset_polygon(SQ, -2.0)
    assert len(out) == 1
    assert geo.polygon_area(out[0]) == pytest.approx(36.0, abs=1.0)


def test_offset_shrink_collapse_returns_empty():
    # pyclipper Execute(-d) → [] when the polygon collapses
    # (reference handles this at src/data_loaders.py:124-128)
    assert geo.offset_polygon([(0, 0), (4, 0), (4, 4), (0, 4)], -3.0) == []
    # over-shrunk triangle: loop-split artifacts must not leak out
    assert geo.offset_polygon([(0, 0), (3, 0), (3, 3)], -5.0) == []


def test_offset_shrink_splits_dumbbell():
    dumb = [(0, 0), (10, 0), (10, 4), (16, 4), (16, 0), (26, 0), (26, 10),
            (16, 10), (16, 6), (10, 6), (10, 10), (0, 10)]
    out = geo.offset_polygon(dumb, -2.0)
    assert len(out) == 2
    for loop in out:
        assert geo.polygon_area(loop) == pytest.approx(36.0, abs=2.0)


def test_offset_reflex_no_slivers():
    lshape = [(0, 0), (20, 0), (20, 10), (10, 10), (10, 30), (0, 30)]
    out = geo.offset_polygon(lshape, 2.0)
    assert len(out) == 1  # sliver at reflex join must be absorbed


def test_shrink_distance_formula():
    # paper eq. 6 as used at src/data_loaders.py:116-122:
    # d = A(1 - r²)/L with r = 0.4
    poly = np.array([(0, 0), (100, 0), (100, 20), (0, 20)], float)
    r = 0.4
    d = geo.polygon_area(poly) * (1 - r ** 2) / geo.polygon_perimeter(poly)
    out = geo.offset_polygon(poly, -d)
    assert len(out) == 1
    shr = out[0]
    # shrunk box: (100-2d) x (20-2d)
    assert geo.polygon_area(shr) == pytest.approx(
        (100 - 2 * d) * (20 - 2 * d), rel=0.05)


def test_border_distance_field_matches_reference_formula():
    # reimplementation of src/db_transforms.py:66-82 in numpy
    def compute_distance(xs, ys, p1, p2):
        sq1 = np.square(xs - p1[0]) + np.square(ys - p1[1])
        sq2 = np.square(xs - p2[0]) + np.square(ys - p2[1])
        sq = np.square(p1[0] - p2[0]) + np.square(p1[1] - p2[1])
        with np.errstate(divide="ignore", invalid="ignore"):
            cosin = (sq - sq1 - sq2) / (2 * np.sqrt(sq1 * sq2))
            ssin = np.nan_to_num(1 - np.square(cosin))
            res = np.sqrt(sq1 * sq2 * ssin / sq)
        res[cosin < 0] = np.sqrt(np.fmin(sq1, sq2))[cosin < 0]
        return res

    poly = np.array([[3., 4.], [25., 6.], [28., 20.], [5., 18.]])
    H, W, norm = 30, 40, 5.0
    xs = np.broadcast_to(np.arange(W, dtype=float).reshape(1, W), (H, W))
    ys = np.broadcast_to(np.arange(H, dtype=float).reshape(H, 1), (H, W))
    dm = np.stack([
        np.clip(compute_distance(xs, ys, poly[i], poly[(i + 1) % len(poly)])
                / norm, 0, 1) for i in range(len(poly))
    ])
    ref = np.min(dm, axis=0)
    ours = geo.border_distance_field(poly, H, W, norm)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_perspective_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    src = (rng.rand(100, 120, 3) * 255).astype(np.uint8)
    sp = np.array([[10, 10], [100, 20], [90, 80], [5, 70]], np.float32)
    dp = np.array([[0, 0], [100, 0], [100, 32], [0, 32]], np.float32)
    m_ref = cv2.getPerspectiveTransform(sp, dp)
    m_ours = geo.get_perspective_transform(sp, dp)
    np.testing.assert_allclose(m_ours, m_ref, atol=1e-8)
    w_ref = cv2.warpPerspective(src, m_ref, (100, 32))
    w_ours = geo.warp_perspective(src, m_ours, (100, 32))
    diff = np.abs(w_ref.astype(int) - w_ours.astype(int))
    assert diff.mean() < 1.0


def test_approx_poly_dp_reduces_points():
    theta = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    circle = np.stack([50 + 30 * np.cos(theta), 50 + 30 * np.sin(theta)], 1)
    out = geo.approx_poly_dp(circle, 3.0)
    assert 4 <= len(out) < 30
    # approximation stays within epsilon-ish of the original
    assert geo.polygon_area(out) == pytest.approx(geo.polygon_area(circle),
                                                  rel=0.1)


def _random_star(rng, n, cx=60, cy=60, rmin=10, rmax=45):
    """Random star-shaped (simple) polygon around a center."""
    angles = np.sort(rng.rand(n) * 2 * np.pi)
    radii = rng.rand(n) * (rmax - rmin) + rmin
    return np.stack([cx + radii * np.cos(angles),
                     cy + radii * np.sin(angles)], axis=1)


def test_offset_fuzz_containment(rng):
    """Dilation contains the source; shrink is contained by it."""
    for _ in range(40):
        poly = _random_star(rng, rng.randint(4, 12))
        if not geo.polygon_is_simple(poly):
            continue
        d = rng.rand() * 6 + 1
        for loop in geo.offset_polygon(poly, d, integer=False):
            # every source vertex inside the dilated loop
            for p in poly:
                assert geo._point_in_polygon(p, loop), (poly, d)
            assert geo.polygon_area(loop) > geo.polygon_area(poly)
        for loop in geo.offset_polygon(poly, -d, integer=False):
            for p in np.asarray(loop, float):
                assert geo._point_in_polygon(p, poly), (poly, d)
            assert geo.polygon_area(loop) < geo.polygon_area(poly)


def test_offset_fuzz_opening_roundtrip(rng):
    """shrink(d) then dilate(d) ≈ morphological opening: close to the
    original for convex polygons."""
    for _ in range(20):
        hull = geo.convex_hull(_random_star(rng, 10))
        if len(hull) < 4:
            continue
        d = 3.0
        shrunk = geo.offset_polygon(hull, -d, integer=False)
        if not shrunk:
            continue
        reopened = geo.offset_polygon(shrunk[0], d, integer=False)
        assert len(reopened) == 1
        a0 = geo.polygon_area(hull)
        a1 = geo.polygon_area(reopened[0])
        assert a1 <= a0 + 1.0
        assert a1 > 0.8 * a0, (a0, a1)


def test_intersection_area_fuzz_vs_raster(rng):
    """Non-convex ∩ non-convex cross-checked against rasterization."""
    scale = 4  # subpixel rasterization
    for _ in range(15):
        a = _random_star(rng, rng.randint(5, 10))
        b = _random_star(rng, rng.randint(5, 10), cx=80, cy=70)
        if not (geo.polygon_is_simple(a) and geo.polygon_is_simple(b)):
            continue
        analytic = geo.intersection_area(a, b)
        img_a = np.zeros((160 * scale, 160 * scale), np.float32)
        img_b = np.zeros((160 * scale, 160 * scale), np.float32)
        geo.fill_poly(img_a, a * scale)
        geo.fill_poly(img_b, b * scale)
        raster = np.logical_and(img_a > 0, img_b > 0).sum() / scale ** 2
        # boundary-inclusive rasterization inflates the raster estimate by
        # up to ~perimeter/scale; tolerate that bias
        tol = (geo.polygon_perimeter(a) + geo.polygon_perimeter(b)) / scale
        assert analytic == pytest.approx(raster, abs=max(tol, 4.0))
