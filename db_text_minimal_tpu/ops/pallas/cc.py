"""On-device connected-components labeling + box statistics.

TPU-native replacement for the thresholding + component-discovery half of
the reference's CPU postprocess (``cv2.findContours`` at
``src/postprocess.py:67-68``; SURVEY.md §2b plan: "thresholding +
connected-components labeling ... on-device; box scoring via on-device
segment-sum"). Exact polygon extraction (contour tracing, Douglas–Peucker,
unclip) stays on host for parity; this path powers the fast box mode and
keeps the device→host transfer down to ``max_components`` box records
instead of full maps.

Algorithm: min-label propagation, entirely gather-free —
``label ← min(label, 8-neighbor labels)`` (VPU shifts) alternated with four
segmented directional min-scans that propagate along whole unbroken runs
per round (associative scans, log-depth). A convergence-checked
``while_loop`` (static cap, static shapes) runs until labels fix-point:
everything jits and shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.int32(2 ** 30)


def _neighbor_min(label: jnp.ndarray, connectivity: int = 8) -> jnp.ndarray:
    """Min over the neighborhood (and self) of an (H, W) label map."""
    padded = jnp.pad(label, 1, constant_values=_INF)
    best = label
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            if connectivity == 4 and dy != 0 and dx != 0:
                continue
            h, w = label.shape
            shifted = jax.lax.dynamic_slice(padded, (1 + dy, 1 + dx), (h, w))
            best = jnp.minimum(best, shifted)
    return best


def _segmented_min_scan(label: jnp.ndarray, mask: jnp.ndarray, axis: int,
                        reverse: bool) -> jnp.ndarray:
    """Directional min-propagation that does not cross background pixels:
    a segmented min-scan (associative, so XLA lowers it to a log-depth scan
    — no gathers, TPU-friendly)."""
    resets = ~mask

    def combine(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf, bv, jnp.minimum(av, bv)), af | bf

    v, _ = jax.lax.associative_scan(combine, (label, resets), axis=axis,
                                    reverse=reverse)
    return jnp.where(mask, v, _INF)


@functools.partial(jax.jit, static_argnames=("num_iters", "connectivity"))
def connected_components(bitmap: jnp.ndarray,
                         num_iters: int = 64,
                         connectivity: int = 8) -> jnp.ndarray:
    """Connected component labels of a binary (H, W) map (8-connected by
    default; ``connectivity=4`` drops the diagonal carries — used for the
    BACKGROUND pass in ``_hole_stats``, where complement connectivity says
    8-connected foreground pairs with 4-connected background). Background =
    -1; each component is labeled by the linear index of its min pixel.

    Each round: one 8-neighbor min (VPU shifts, carries labels across
    diagonals) then four segmented directional min-scans (left/right/up/down)
    that each propagate along entire unbroken runs in one step. Convergence
    is bounded by the number of "turns" in a component, not its diameter —
    text blobs converge in 1-2 rounds, serpentine worst cases in
    O(#corners). Entirely gather-free.

    Runs as a convergence-checked ``while_loop`` capped at ``num_iters``:
    typical scenes exit after 2-4 rounds (one cheap ``any``-reduction per
    round), while long winding components get the rounds they need — a
    FIXED 16-round loop measurably split curved/merged text on recall-heavy
    models (a 640² spiral needs 32: 3 fragment labels at 16 iters, each
    becoming a spurious box)."""
    h, w = bitmap.shape
    mask = bitmap > 0
    idx = (jnp.arange(h * w, dtype=jnp.int32).reshape(h, w))
    label = jnp.where(mask, idx, _INF)

    def one_round(label):
        label = jnp.minimum(
            label, jnp.where(mask, _neighbor_min(label, connectivity), _INF))
        for axis in (1, 0):
            for reverse in (False, True):
                label = jnp.minimum(
                    label, _segmented_min_scan(label, mask, axis, reverse))
        return label

    def cond(carry):
        _, i, changed = carry
        return changed & (i < num_iters)

    def body(carry):
        label, i, _ = carry
        new = one_round(label)
        return new, i + 1, jnp.any(new != label)

    label, _, _ = jax.lax.while_loop(cond, body,
                                     (label, jnp.int32(0), jnp.bool_(True)))
    return jnp.where(mask, label, -1)


def _compact_slots(flat_labels: jnp.ndarray, max_components: int):
    """Compact arbitrary component label ids (= linear index of each
    component's min pixel; background -1) into slots [0, max_components).

    Sort-free (the previous ``jnp.unique`` compaction spent most of
    ``fast_boxes``'s time in its O(N log N) sort): a pixel is its
    component's *root* iff its own linear index equals its label, so the
    rank of a root among all roots (an associative-scan cumsum) is its
    component's slot. Sorted root indices come from a segment-min scatter
    into ``max_components + 1`` buckets; every pixel then finds its slot by
    binary-searching its label in that tiny sorted table. Overflow
    components and background land in the dropped slot ``max_components``.

    Returns (keyed (N,) int32 slot per pixel, valid_root (K,) bool).
    """
    n = flat_labels.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    is_root = flat_labels == idx
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1   # slot at root pixels
    bucket = jnp.where(is_root, jnp.minimum(rank, max_components),
                       max_components)
    root_idx = jnp.full((max_components + 1,), _INF, jnp.int32)
    root_idx = root_idx.at[bucket].min(jnp.where(is_root, idx, _INF))
    is_fg = flat_labels >= 0
    fg_labels = jnp.where(is_fg, flat_labels, _INF)
    slot = jnp.minimum(
        jnp.searchsorted(root_idx, fg_labels).astype(jnp.int32),
        max_components)
    keyed = jnp.where(is_fg, slot, max_components)
    valid_root = root_idx[:max_components] < _INF
    return keyed, valid_root


@functools.partial(jax.jit, static_argnames=("max_components",))
def component_boxes(prob_map: jnp.ndarray, labels: jnp.ndarray,
                    max_components: int = 100):
    """Per-component stats from a (H, W) prob map + label map:
    returns (boxes (K, 4) as [xmin, ymin, xmax, ymax], scores (K,) = mean
    prob over the component, areas (K,), valid (K,) bool), padded to
    ``max_components`` (static shapes — the reference's
    ``max_candidates=1000`` padding idea, ``src/postprocess.py:11``)."""
    h, w = labels.shape
    flat_labels = labels.reshape(-1)
    flat_prob = prob_map.reshape(-1).astype(jnp.float32)

    keyed, valid_root = _compact_slots(flat_labels, max_components)

    ys = (jnp.arange(h * w, dtype=jnp.int32) // w).astype(jnp.float32)
    xs = (jnp.arange(h * w, dtype=jnp.int32) % w).astype(jnp.float32)

    def seg(op, values, init):
        out = jnp.full((max_components + 1,), init, values.dtype)
        return getattr(out.at[keyed], op)(values)[:max_components]

    count = seg("add", jnp.ones_like(flat_prob), 0.0)
    score_sum = seg("add", flat_prob, 0.0)
    xmin = seg("min", xs, jnp.float32(w))
    xmax = seg("max", xs, jnp.float32(-1))
    ymin = seg("min", ys, jnp.float32(h))
    ymax = seg("max", ys, jnp.float32(-1))

    valid = valid_root & (count > 0)
    scores = jnp.where(valid, score_sum / jnp.maximum(count, 1.0), 0.0)
    boxes = jnp.stack([xmin, ymin, xmax, ymax], axis=1)
    return boxes, scores, count, valid


@functools.partial(jax.jit,
                   static_argnames=("max_components", "num_angles",
                                    "hole_filled_score"))
def component_rotated_boxes(prob_map: jnp.ndarray, labels: jnp.ndarray,
                            max_components: int = 100,
                            num_angles: int = 5,
                            hole_filled_score: bool = False):
    """Per-component ORIENTED rectangles — the on-device analogue of the
    reference's ``cv2.minAreaRect`` over each contour
    (``src/postprocess.py:158-184``).

    Method: per-component second moments (segment sums of centered
    coordinates) give the PCA principal angle; a coarse-to-fine angle
    search around it (±45° at 7.5° spacing, then two per-component
    refinement stages down to ~0.16° — the rect area is scored by
    projected extents and the tightest wins). Sub-degree resolution
    matters: the evaluators match at IoU 0.4, exactly where a rect over a
    curved polygon sits, and a half-degree-offset rect measurably flips
    borderline matches vs the host's exact rotating-calipers rect. All
    segment reductions are scatters into ``max_components + 1`` buckets —
    static shapes, no host sync. ``num_angles`` sets the per-stage
    candidate count (coarse stage uses ``2·num_angles + 3``).

    Returns (corners (K, 4, 2) float32 xy, sides (K, 2) = (w, h),
    scores (K,) mean prob over the component, valid (K,) bool). Corner
    order is rotation-consistent but not the reference's
    clockwise-from-top-left; callers order on host (K tiny).
    """
    h, w = labels.shape
    flat_labels = labels.reshape(-1)
    flat_prob = prob_map.reshape(-1).astype(jnp.float32)
    keyed, valid_root = _compact_slots(flat_labels, max_components)

    ys = (jnp.arange(h * w, dtype=jnp.int32) // w).astype(jnp.float32)
    xs = (jnp.arange(h * w, dtype=jnp.int32) % w).astype(jnp.float32)

    def seg(op, values, init):
        out = jnp.full((max_components + 1,), init, values.dtype)
        return getattr(out.at[keyed], op)(values)[:max_components]

    # pass 1: zeroth/first moments + score
    count = seg("add", jnp.ones_like(flat_prob), 0.0)
    score_sum = seg("add", flat_prob, 0.0)
    safe_n = jnp.maximum(count, 1.0)
    cx = seg("add", xs, 0.0) / safe_n
    cy = seg("add", ys, 0.0) / safe_n

    def lookup(table):
        # per-pixel value of its slot: tiny-table gather (K+1 entries) —
        # unlike the flat large-array gathers CLAUDE.md warns about
        padded = jnp.concatenate([table, jnp.zeros((1,), table.dtype)])
        return jnp.take(padded, keyed)

    # pass 2: centered second moments (two-pass = no f32 cancellation)
    dx = xs - lookup(cx)
    dy = ys - lookup(cy)
    fg = keyed < max_components
    zero = jnp.float32(0)
    sxx = seg("add", jnp.where(fg, dx * dx, zero), 0.0)
    syy = seg("add", jnp.where(fg, dy * dy, zero), 0.0)
    sxy = seg("add", jnp.where(fg, dx * dy, zero), 0.0)
    theta = 0.5 * jnp.arctan2(2.0 * sxy, sxx - syy)

    def extent(ang):
        """Projected extents at per-component angles ``ang`` (K,)."""
        c, s = jnp.cos(ang), jnp.sin(ang)
        u = dx * lookup(c) + dy * lookup(s)
        v = -dx * lookup(s) + dy * lookup(c)
        big = jnp.float32(1e9)
        umin = seg("min", jnp.where(fg, u, big), big)
        umax = seg("max", jnp.where(fg, u, -big), -big)
        vmin = seg("min", jnp.where(fg, v, big), big)
        vmax = seg("max", jnp.where(fg, v, -big), -big)
        return jnp.stack([umin, umax, vmin, vmax])  # (4, K)

    def stage(theta, half_span_deg, count):
        """One coarse-to-fine pass: score ``count`` angles within
        ±half_span around each component's current angle, keep the
        tightest. Returns (theta', exts at theta')."""
        offsets = jnp.linspace(-half_span_deg, half_span_deg,
                               count) * (jnp.pi / 180.0)
        exts = jax.vmap(lambda off: extent(theta + off))(offsets)  # (A,4,K)
        areas = (exts[:, 1] - exts[:, 0]) * (exts[:, 3] - exts[:, 2])
        best = jnp.argmin(areas, axis=0)                           # (K,)
        pick = lambda a: jnp.take_along_axis(a, best[None, :], axis=0)[0]
        return (theta + jnp.take(offsets, best),
                jnp.stack([pick(exts[:, j]) for j in range(4)]))

    # coarse ±45° (covers PCA-vs-minAreaRect disagreement on curved
    # blobs), then three refinements, each bracketing the previous stage's
    # spacing; final resolution ≈ 0.16° at the default num_angles=5 — at
    # 0.6° the residual rect rotation shifted corners 1-2 px, enough to
    # flip DetEval's tr=0.8 area-recall gates on borderline matches
    na = max(int(num_angles), 3)
    shrink = (na - 1) // 2 + 1
    theta1, _ = stage(theta, 45.0, 2 * na + 3)
    span2 = 45.0 / (na + 1)
    theta2, _ = stage(theta1, span2, na)
    span3 = span2 / shrink
    theta3, _ = stage(theta2, span3, na)
    ang, exts = stage(theta3, span3 / shrink, na)
    umin, umax, vmin, vmax = exts[0], exts[1], exts[2], exts[3]
    c, s = jnp.cos(ang), jnp.sin(ang)

    # rect center in image coords = uv-center mapped back about the centroid
    uc, vc = (umin + umax) / 2.0, (vmin + vmax) / 2.0
    center = jnp.stack([cx + uc * c - vc * s,
                        cy + uc * s + vc * c], axis=1)  # (K, 2)
    corners = _rect_corners(center, c, s,
                            (umax - umin) / 2.0, (vmax - vmin) / 2.0)
    sides = jnp.stack([umax - umin, vmax - vmin], axis=1)
    valid = valid_root & (count > 0)
    if hole_filled_score:
        # score support = component + enclosed holes, matching the host's
        # filled-outer-contour mean (src/postprocess.py:186-198). The
        # component-only mean reads HIGH on soft/holey maps (early-epoch
        # models): it averages only supra-threshold pixels, so near-gate
        # fragments that the host rejects at box_thresh survive — measured
        # ~-4 DetEval on 10-epoch checkpoints while converged models
        # (clean solid components) show no difference.
        bitmap = (labels >= 0).astype(jnp.int32)
        hole_sum, hole_cnt = _hole_stats(bitmap, keyed, flat_prob, h, w,
                                         max_components)
        denom = count + hole_cnt
        scores = jnp.where(valid & (denom > 0),
                           (score_sum + hole_sum)
                           / jnp.maximum(denom, 1.0), 0.0)
    else:
        scores = jnp.where(valid, score_sum / safe_n, 0.0)
    return corners, sides, scores, valid, center, ang


def _rect_corners(center, c, s, half_w, half_h):
    """Corners (K, 4, 2) of rects with centers (K, 2), unit axes from
    cos/sin (K,), and half extents (K,) along each axis."""
    us = jnp.stack([-half_w, half_w, half_w, -half_w], axis=1)   # (K, 4)
    vs = jnp.stack([-half_h, -half_h, half_h, half_h], axis=1)
    px = center[:, 0:1] + us * c[:, None] - vs * s[:, None]
    py = center[:, 1:2] + us * s[:, None] + vs * c[:, None]
    return jnp.stack([px, py], axis=-1)


@functools.partial(jax.jit, static_argnames=(
    "min_size", "max_components", "num_iters", "num_angles", "unclip",
    "hole_filled_score"))
def _device_boxes_single(prob_map, thresh, box_thresh, unclip_ratio,
                         min_size: int, max_components: int,
                         num_iters: int, num_angles: int,
                         unclip: bool = True,
                         hole_filled_score: bool = True):
    bitmap = (prob_map > thresh).astype(jnp.int32)
    labels = connected_components(bitmap, num_iters=num_iters)
    corners, sides, scores, valid, center, ang = component_rotated_boxes(
        prob_map, labels, max_components=max_components,
        num_angles=num_angles, hole_filled_score=hole_filled_score)
    w0, h0 = sides[:, 0], sides[:, 1]
    keep = valid & (jnp.minimum(w0, h0) >= min_size) & (scores >= box_thresh)
    if not unclip:
        # pre-unclip rects: the caller host-finishes with the EXACT
        # offset-polygon unclip (the ideal +d growth used on device is
        # ~0.4 px/side larger than the chord-approximated round joins the
        # host/reference use — enough to flip DetEval's tp=0.4 gates on
        # curved text; K-record host finishing keeps parity AND the tiny
        # transfer)
        return corners, scores, keep
    # on-device unclip (src/postprocess.py:150-156): a round-join offset of
    # a rectangle by d = A·ratio/L followed by minAreaRect is the same
    # rectangle grown by d on each side (up to the chord approximation)
    area = w0 * h0
    length = 2.0 * (w0 + h0)
    d = jnp.where(length > 0, area * unclip_ratio / jnp.maximum(length, 1e-6),
                  0.0)
    corners2 = _rect_corners(center, jnp.cos(ang), jnp.sin(ang),
                             w0 / 2.0 + d, h0 / 2.0 + d)
    w2, h2 = w0 + 2.0 * d, h0 + 2.0 * d
    keep = keep & (jnp.minimum(w2, h2) >= min_size + 2)
    return corners2, scores, keep


def device_boxes(prob_maps, thresh: float = 0.3, box_thresh: float = 0.7,
                 unclip_ratio: float = 1.5, min_size: int = 3,
                 max_components: int = 1000, num_iters: int = 64,
                 num_angles: int = 5, unclip: bool = True,
                 hole_filled_score: bool = True):
    """On-device rotated-box postprocess over a BATCH of prob maps
    (N, H, W): threshold → connected components → oriented min-rects
    (→ unclip → post-unclip size filter when ``unclip``), mirroring the
    reference's rect mode (``src/postprocess.py:106-148``) without shipping
    maps to the host. With ``unclip=False`` the rects come back PRE-unclip
    for exact host-side offset finishing (see ``_device_boxes_single``).
    Returns (corners (N, K, 4, 2) f32 xy, scores (N, K), keep (N, K)) —
    the D2H transfer is N·K box records instead of N·H·W map pixels."""
    fn = functools.partial(
        _device_boxes_single, min_size=min_size,
        max_components=max_components, num_iters=num_iters,
        num_angles=num_angles, unclip=unclip,
        hole_filled_score=hole_filled_score)
    return jax.vmap(
        lambda p: fn(p, jnp.float32(thresh), jnp.float32(box_thresh),
                     jnp.float32(unclip_ratio)))(prob_maps)


def _hole_stats(bitmap, fg_keyed, flat_prob, h, w, max_components):
    """Per-FG-component hole statistics: sum/count of prob over enclosed
    background ("holes" — bg components not touching the image border),
    keyed by the ENCLOSING fg component's slot.

    The host's ``box_score_fast`` fills the OUTER contour polygon, so its
    mean includes hole pixels (``src/postprocess.py:186-198``); the device
    score must include them too or the two paths disagree exactly at the
    ``box_thresh`` gate on components with interior holes (glyph counters,
    broken strokes)."""
    # 4-connected bg labels (complement connectivity for 8-connected fg):
    # with 8-connected bg, a hole sealed only by diagonal strokes leaks to
    # the outside background, gets marked border-touching, and is dropped
    # from the device score while the host's filled-outer-contour mean
    # keeps it — a residual divergence exactly at the box_thresh gate.
    bg = bitmap == 0
    bg_labels = connected_components(bg.astype(jnp.int32), connectivity=4)
    bg_keyed, _ = _compact_slots(bg_labels.reshape(-1), max_components)

    # border-touching bg components are "outside", not holes
    row = jnp.arange(h, dtype=jnp.int32)
    col = jnp.arange(w, dtype=jnp.int32)
    is_border = ((row[:, None] == 0) | (row[:, None] == h - 1)
                 | (col[None, :] == 0) | (col[None, :] == w - 1))
    border_hits = jnp.zeros((max_components + 1,), jnp.int32)
    border_hits = border_hits.at[bg_keyed].max(
        is_border.reshape(-1).astype(jnp.int32))

    # enclosing fg slot per bg component = MIN fg slot among 8-neighbors.
    # Min, not max: when another component is NESTED inside the hole, the
    # hole borders both, and slots are assigned in raster order of each
    # component's root pixel — the enclosing ring's topmost pixel always
    # precedes any nested component's, so the minimum adjacent slot IS
    # the enclosing component. (Max routed such holes to the nested
    # blob, corrupting its score with hole pixels the host never adds.)
    fg_slot_map = jnp.where(
        fg_keyed.reshape(h, w) < max_components,
        fg_keyed.reshape(h, w), max_components)
    padded = jnp.pad(fg_slot_map, 1, constant_values=max_components)
    neigh_best = jnp.full((h, w), max_components, jnp.int32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh_best = jnp.minimum(
                neigh_best,
                jax.lax.dynamic_slice(padded, (1 + dy, 1 + dx), (h, w)))
    enclosing = jnp.full((max_components + 1,), max_components, jnp.int32)
    enclosing = enclosing.at[bg_keyed].min(
        jnp.where(bg.reshape(-1), neigh_best.reshape(-1), max_components))

    # route each hole pixel's prob to its enclosing fg slot
    enc_ok = (enclosing < max_components) & (border_hits == 0)
    target = jnp.where(enc_ok, enclosing, max_components)
    per_pixel_target = jnp.take(target, bg_keyed)
    per_pixel_target = jnp.where(bg.reshape(-1), per_pixel_target,
                                 max_components)
    hole_sum = jnp.zeros((max_components + 1,), jnp.float32)
    hole_sum = hole_sum.at[per_pixel_target].add(flat_prob)[:max_components]
    hole_cnt = jnp.zeros((max_components + 1,), jnp.float32)
    hole_cnt = hole_cnt.at[per_pixel_target].add(1.0)[:max_components]
    return hole_sum, hole_cnt


@functools.partial(jax.jit, static_argnames=("max_components",))
def _device_poly_stats_single(prob_map, thresh, max_components: int):
    """Device half of the device-assisted POLYGON path: threshold → CC →
    per-component bbox + hole-filled mean prob + bit-packed bitmap. The
    host traces exact contours / Douglas-Peucker / unclip on the unpacked
    bitmap (32× smaller D2H than the f32 map) and looks up each contour's
    score by bbox match (outer contour bbox == component pixel bbox)."""
    h, w = prob_map.shape
    bitmap = (prob_map > thresh).astype(jnp.int32)
    labels = connected_components(bitmap)
    flat_prob = prob_map.reshape(-1).astype(jnp.float32)
    keyed, valid_root = _compact_slots(labels.reshape(-1), max_components)

    ys = (jnp.arange(h * w, dtype=jnp.int32) // w).astype(jnp.float32)
    xs = (jnp.arange(h * w, dtype=jnp.int32) % w).astype(jnp.float32)

    def seg(op, values, init):
        out = jnp.full((max_components + 1,), init, values.dtype)
        return getattr(out.at[keyed], op)(values)[:max_components]

    count = seg("add", jnp.ones_like(flat_prob), 0.0)
    score_sum = seg("add", flat_prob, 0.0)
    xmin = seg("min", xs, jnp.float32(w))
    xmax = seg("max", xs, jnp.float32(-1))
    ymin = seg("min", ys, jnp.float32(h))
    ymax = seg("max", ys, jnp.float32(-1))

    hole_sum, hole_cnt = _hole_stats(bitmap, keyed, flat_prob, h, w,
                                     max_components)
    denom = count + hole_cnt
    scores = jnp.where(denom > 0, (score_sum + hole_sum)
                       / jnp.maximum(denom, 1.0), 0.0)
    valid = valid_root & (count > 0)
    bboxes = jnp.stack([xmin, ymin, xmax, ymax], axis=1).astype(jnp.int32)

    # MSB-first bit-pack (np.unpackbits default order on host); accumulate
    # in int32 — a uint8 sum could wrap under jnp's no-promotion rules.
    # Pad the row to the next byte boundary for non-multiple-of-8 widths
    # (the host unpack slices back to ``width``).
    w8 = -(-w // 8) * 8
    row_padded = (bitmap if w8 == w
                  else jnp.pad(bitmap, ((0, 0), (0, w8 - w))))
    bits = row_padded.reshape(h, w8 // 8, 8).astype(jnp.int32)
    weights = jnp.int32(1) << jnp.arange(7, -1, -1, dtype=jnp.int32)
    packed = (bits * weights).sum(axis=-1).astype(jnp.uint8)
    return packed, bboxes, scores, valid


def device_poly_stats(prob_maps, thresh: float = 0.3,
                      max_components: int = 1000):
    """Batched device half of the device-assisted polygon mode (VERDICT r2
    ask #4). Returns (packed_bitmaps (N, H, W/8) uint8, bboxes
    (N, K, 4) int32 [xmin, ymin, xmax, ymax], scores (N, K) f32 hole-filled
    component mean prob, valid (N, K) bool)."""
    fn = functools.partial(_device_poly_stats_single,
                           max_components=max_components)
    return jax.vmap(lambda p: fn(p, jnp.float32(thresh)))(prob_maps)


def fast_boxes(prob_map, thresh: float = 0.3, box_thresh: float = 0.7,
               min_size: int = 3, max_components: int = 1000,
               num_iters: int = 64):
    """Fully on-device fast box path: threshold → CCL → per-component
    axis-aligned boxes + scores, filtered like the reference's rect mode
    (score ≥ box_thresh, min side ≥ min_size). Returns device arrays —
    callers transfer only (K, 6) numbers instead of full maps."""
    bitmap = (prob_map > thresh).astype(jnp.int32)
    labels = connected_components(bitmap, num_iters=num_iters)
    boxes, scores, areas, valid = component_boxes(prob_map, labels,
                                                  max_components)
    wide = boxes[:, 2] - boxes[:, 0] + 1
    tall = boxes[:, 3] - boxes[:, 1] + 1
    keep = valid & (scores >= box_thresh) & \
        (jnp.minimum(wide, tall) >= min_size)
    return boxes, scores, keep
