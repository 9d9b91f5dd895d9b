"""Python bindings for the first-party C++ host geometry library.

This is the TPU-framework replacement for the reference's third-party
geometry stack (SURVEY.md §2b): pyclipper (polygon offsetting,
``src/data_loaders.py:119-122``, ``src/postprocess.py:150-156``), shapely/GEOS
(area/length/validity/intersection, ``src/iou.py:14-26``), and the OpenCV
contour/fill/minAreaRect/warp calls of ``src/postprocess.py`` and
``src/test_ocr.py:174-175``.

The shared library is compiled lazily from ``cpp/geometry.cpp`` with g++ and
cached next to the source; only sources are committed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cpp", "geometry.cpp")
_LIB_PATH = os.path.join(_HERE, "_libgeometry.so")
_BUILD_LOCK = threading.Lock()
_lib = None


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _LIB_PATH,
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _BUILD_LOCK:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        c_dp = ctypes.POINTER(ctypes.c_double)
        c_ip = ctypes.POINTER(ctypes.c_int)
        c_fp = ctypes.POINTER(ctypes.c_float)
        c_u8p = ctypes.POINTER(ctypes.c_uint8)

        lib.geo_polygon_area.restype = ctypes.c_double
        lib.geo_polygon_area.argtypes = [c_dp, ctypes.c_int]
        lib.geo_polygon_signed_area.restype = ctypes.c_double
        lib.geo_polygon_signed_area.argtypes = [c_dp, ctypes.c_int]
        lib.geo_polygon_perimeter.restype = ctypes.c_double
        lib.geo_polygon_perimeter.argtypes = [c_dp, ctypes.c_int]
        lib.geo_polygon_is_simple.restype = ctypes.c_int
        lib.geo_polygon_is_simple.argtypes = [c_dp, ctypes.c_int]
        lib.geo_intersection_area.restype = ctypes.c_double
        lib.geo_intersection_area.argtypes = [c_dp, ctypes.c_int, c_dp,
                                              ctypes.c_int]
        lib.geo_convex_hull.restype = ctypes.c_int
        lib.geo_convex_hull.argtypes = [c_dp, ctypes.c_int, c_dp, ctypes.c_int]
        lib.geo_min_area_rect.restype = None
        lib.geo_min_area_rect.argtypes = [c_dp, ctypes.c_int, c_dp, c_dp]
        lib.geo_approx_poly_dp.restype = ctypes.c_int
        lib.geo_approx_poly_dp.argtypes = [c_dp, ctypes.c_int,
                                           ctypes.c_double, c_dp, ctypes.c_int]
        lib.geo_offset_polygon.restype = ctypes.c_int
        lib.geo_offset_polygon.argtypes = [c_dp, ctypes.c_int,
                                           ctypes.c_double, ctypes.c_double,
                                           c_dp, c_ip, ctypes.c_int,
                                           ctypes.c_int]
        lib.geo_find_contours.restype = ctypes.c_int
        lib.geo_find_contours.argtypes = [c_u8p, ctypes.c_int, ctypes.c_int,
                                          c_ip, c_ip, ctypes.c_int,
                                          ctypes.c_int]
        lib.geo_fill_poly.restype = None
        lib.geo_fill_poly.argtypes = [c_fp, ctypes.c_int, ctypes.c_int, c_dp,
                                      ctypes.c_int, ctypes.c_float]
        lib.geo_border_distance_field.restype = None
        lib.geo_border_distance_field.argtypes = [c_dp, ctypes.c_int,
                                                  ctypes.c_int, ctypes.c_int,
                                                  ctypes.c_double, c_fp]
        lib.geo_perspective_transform.restype = ctypes.c_int
        lib.geo_perspective_transform.argtypes = [c_dp, c_dp, c_dp]
        lib.geo_warp_perspective.restype = None
        lib.geo_warp_perspective.argtypes = [c_u8p, ctypes.c_int, ctypes.c_int,
                                             ctypes.c_int, c_dp, c_u8p,
                                             ctypes.c_int, ctypes.c_int]
        _lib = lib
    return _lib


def _as_poly(poly) -> np.ndarray:
    arr = np.ascontiguousarray(np.asarray(poly, dtype=np.float64))
    if arr.ndim != 2 or arr.shape[1] != 2:
        arr = arr.reshape(-1, 2)
    return arr


def _dp(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def polygon_area(poly) -> float:
    """|shoelace| area (shapely ``Polygon.area``, ``src/data_loaders.py:116``)."""
    p = _as_poly(poly)
    return float(_load().geo_polygon_area(_dp(p), len(p)))


def polygon_signed_area(poly) -> float:
    p = _as_poly(poly)
    return float(_load().geo_polygon_signed_area(_dp(p), len(p)))


def polygon_perimeter(poly) -> float:
    """shapely ``Polygon.length`` (``src/data_loaders.py:117``)."""
    p = _as_poly(poly)
    return float(_load().geo_polygon_perimeter(_dp(p), len(p)))


def polygon_is_simple(poly) -> bool:
    """No self-intersections — stand-in for the reference's
    ``Polygon(...).buffer(0).is_valid`` gate (``src/data_loaders.py:86``)."""
    p = _as_poly(poly)
    if len(p) < 3:
        return False
    return bool(_load().geo_polygon_is_simple(_dp(p), len(p)))


def intersection_area(poly_a, poly_b) -> float:
    """Area of polygon intersection (GEOS ``a.intersection(b).area``,
    ``src/iou.py:14-20``). Exact for simple polygons via triangulated
    convex-convex clipping."""
    a, b = _as_poly(poly_a), _as_poly(poly_b)
    if len(a) < 3 or len(b) < 3:
        return 0.0
    return float(_load().geo_intersection_area(_dp(a), len(a), _dp(b), len(b)))


def union_area(poly_a, poly_b) -> float:
    """GEOS ``a.union(b).area`` for simple polygons (inclusion-exclusion)."""
    return (polygon_area(poly_a) + polygon_area(poly_b)
            - intersection_area(poly_a, poly_b))


def convex_hull(points) -> np.ndarray:
    p = _as_poly(points)
    out = np.empty((len(p) + 1, 2), dtype=np.float64)
    m = _load().geo_convex_hull(_dp(p), len(p), _dp(out), len(out))
    return out[:m]


def min_area_rect(points):
    """cv2.minAreaRect equivalent (``src/postprocess.py:160``): returns
    (4 corner points float64 (4,2), (w, h))."""
    p = _as_poly(points)
    corners = np.empty((4, 2), dtype=np.float64)
    wh = np.empty((2,), dtype=np.float64)
    _load().geo_min_area_rect(_dp(p), len(p), _dp(corners), _dp(wh))
    return corners, (float(wh[0]), float(wh[1]))


def approx_poly_dp(poly, epsilon: float) -> np.ndarray:
    """cv2.approxPolyDP (closed) equivalent (``src/postprocess.py:71-72``)."""
    p = _as_poly(poly)
    out = np.empty((max(len(p), 4), 2), dtype=np.float64)
    m = _load().geo_approx_poly_dp(_dp(p), len(p), float(epsilon), _dp(out),
                                   len(out))
    return out[:m]


def offset_polygon(poly, delta: float, arc_tolerance: float = 0.25,
                   integer: bool = True) -> list[np.ndarray]:
    """Clipper-style closed-polygon offset with round joins
    (pyclipper ``PyclipperOffset(JT_ROUND, ET_CLOSEDPOLYGON).Execute(delta)``,
    used for shrink ``src/data_loaders.py:119-122``, dilate
    ``src/db_transforms.py:19-21`` and unclip ``src/postprocess.py:150-156``).

    ``integer=True`` reproduces pyclipper's integer-grid behavior (inputs
    rounded to ints, outputs rounded to ints)."""
    p = _as_poly(poly)
    if integer:
        p = np.round(p)
    max_pts = 16 * len(p) + 4096
    out_xy = np.empty((max_pts, 2), dtype=np.float64)
    out_sizes = np.zeros((64,), dtype=np.int32)
    np_polys = _load().geo_offset_polygon(
        _dp(p), len(p), float(delta), float(arc_tolerance), _dp(out_xy),
        out_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), max_pts, 64)
    result = []
    start = 0
    for i in range(np_polys):
        sz = int(out_sizes[i])
        loop = out_xy[start:start + sz].copy()
        start += sz
        if delta < 0:
            # Erosion correctness check: every vertex of a genuine shrink
            # output lies at distance >= |delta| from the input boundary
            # (offset-line intersections sit exactly at |delta|). Loop-split
            # artifacts from collapsed regions sit closer — drop them, which
            # reproduces pyclipper returning [] for over-shrunk polygons.
            dmin = _min_distance_to_boundary(loop, p)
            if dmin < abs(delta) - 1.5:
                continue
        if integer:
            loop = np.round(loop)
            # drop consecutive duplicates created by rounding
            keep = np.any(loop != np.roll(loop, 1, axis=0), axis=1)
            loop = loop[keep]
            if len(loop) < 3:
                continue
            loop = loop.astype(np.int64)
        result.append(loop)
    # largest-area loop first (pyclipper returns the dominant outline first;
    # callers take [0]: src/data_loaders.py:131, src/db_transforms.py:21)
    result.sort(key=lambda q: -abs(polygon_signed_area(q)))
    # Clipper resolves the raw offset outline with a nonzero-fill union; our
    # loop splitting can leave small slivers adjacent to reflex joins that
    # such a union would absorb. Drop any loop whose centroid falls inside an
    # already-kept (larger) loop.
    kept: list[np.ndarray] = []
    for loop in result:
        centroid = np.asarray(loop, dtype=np.float64).mean(axis=0)
        if any(_point_in_polygon(centroid, k) for k in kept):
            continue
        kept.append(loop)
    return kept


def _min_distance_to_boundary(points: np.ndarray, poly: np.ndarray) -> float:
    """Min over `points` of distance to the closed polyline `poly`."""
    pts = np.asarray(points, dtype=np.float64)
    a = np.asarray(poly, dtype=np.float64)
    b = np.roll(a, -1, axis=0)
    ab = b - a                                        # (E, 2)
    ap = pts[:, None, :] - a[None, :, :]              # (P, E, 2)
    denom = np.maximum((ab * ab).sum(-1), 1e-12)      # (E,)
    t = np.clip((ap * ab[None]).sum(-1) / denom, 0.0, 1.0)
    closest = a[None] + t[..., None] * ab[None]
    d = np.linalg.norm(pts[:, None, :] - closest, axis=-1)
    return float(d.min(axis=1).min())


def _point_in_polygon(point, poly) -> bool:
    """Ray-casting even-odd test (boundary counts as inside)."""
    x, y = float(point[0]), float(point[1])
    p = np.asarray(poly, dtype=np.float64)
    x0, y0 = p[:, 0], p[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    crosses = ((y0 <= y) != (y1 <= y))
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x0 + (y - y0) / (y1 - y0) * (x1 - x0)
    return bool(np.count_nonzero(crosses & (x < xint)) % 2)


def find_contours(binary_image: np.ndarray, max_contours: int = 2048):
    """cv2.findContours(RETR_LIST, CHAIN_APPROX_SIMPLE) equivalent
    (``src/postprocess.py:67-68``): Suzuki-Abe border following. Returns a
    list of (K, 2) int32 arrays of (x, y) points."""
    img = np.ascontiguousarray(binary_image.astype(np.uint8))
    h, w = img.shape
    max_pts = h * w + 4
    out_pts = np.empty((max_pts, 2), dtype=np.int32)
    out_sizes = np.zeros((max_contours,), dtype=np.int32)
    n = _load().geo_find_contours(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out_pts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), max_pts,
        max_contours)
    contours = []
    start = 0
    for i in range(n):
        sz = int(out_sizes[i])
        contours.append(out_pts[start:start + sz].copy())
        start += sz
    return contours


def fill_poly(image: np.ndarray, polys, value: float = 1.0) -> np.ndarray:
    """cv2.fillPoly equivalent (scanline + boundary), in-place on a float32
    image (``src/data_loaders.py:112,134``, ``src/postprocess.py:197``)."""
    assert image.dtype == np.float32 and image.flags.c_contiguous
    h, w = image.shape
    if isinstance(polys, np.ndarray) and polys.ndim == 2:
        polys = [polys]
    lib = _load()
    for poly in polys:
        p = _as_poly(poly)
        lib.geo_fill_poly(
            image.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
            _dp(p), len(p), float(value))
    return image


def border_distance_field(poly, height: int, width: int,
                          norm: float) -> np.ndarray:
    """Per-pixel min-over-edges distance of the reference's
    ``draw_thresh_map`` (``src/db_transforms.py:41-82``), normalized by
    ``norm`` and clipped to [0, 1]. C++ replaces the per-edge numpy loop —
    the CPU hot spot of GT label generation (SURVEY.md §3.1)."""
    p = _as_poly(poly)
    out = np.empty((height, width), dtype=np.float32)
    _load().geo_border_distance_field(
        _dp(p), len(p), height, width, float(norm),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def get_perspective_transform(src_pts, dst_pts) -> np.ndarray:
    """cv2.getPerspectiveTransform equivalent (``src/test_ocr.py:174``)."""
    src = _as_poly(src_pts)
    dst = _as_poly(dst_pts)
    out = np.empty((3, 3), dtype=np.float64)
    ok = _load().geo_perspective_transform(_dp(src), _dp(dst), _dp(out))
    if not ok:
        raise ValueError("degenerate point configuration")
    return out


def warp_perspective(image: np.ndarray, matrix: np.ndarray,
                     out_size: tuple[int, int]) -> np.ndarray:
    """cv2.warpPerspective equivalent (``src/test_ocr.py:175``).
    out_size = (width, height) like cv2."""
    img = np.ascontiguousarray(image.astype(np.uint8))
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ow, oh = out_size
    m = np.ascontiguousarray(matrix.astype(np.float64)).reshape(9)
    dst = np.zeros((oh, ow, c), dtype=np.uint8)
    _load().geo_warp_perspective(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), oh, ow)
    if image.ndim == 2:
        dst = dst[:, :, 0]
    return dst
