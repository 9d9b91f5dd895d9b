"""On-device connected-components labeling + box statistics.

TPU-native replacement for the thresholding + component-discovery half of
the reference's CPU postprocess (``cv2.findContours`` at
``src/postprocess.py:67-68``; SURVEY.md §2b plan: "thresholding +
connected-components labeling ... on-device; box scoring via on-device
segment-sum"). Exact polygon extraction (contour tracing, Douglas–Peucker,
unclip) stays on host for parity; this path powers the fast box mode and
keeps the device→host transfer down to ``max_components`` box records
instead of full maps.

Algorithm: min-label propagation with pointer jumping —
``label ← min(label, 8-neighbor labels)`` (VPU shifts) alternated with
``label ← label[label]`` (one gather), which collapses label chains in
O(log diameter) rounds. Static iteration count, static shapes: everything
jits and shards.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.int32(2 ** 30)


def _neighbor_min(label: jnp.ndarray) -> jnp.ndarray:
    """Min over the 8-neighborhood (and self) of an (H, W) label map."""
    padded = jnp.pad(label, 1, constant_values=_INF)
    best = label
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
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


@functools.partial(jax.jit, static_argnames=("num_iters",))
def connected_components(bitmap: jnp.ndarray,
                         num_iters: int = 8) -> jnp.ndarray:
    """8-connected component labels of a binary (H, W) map. Background = -1;
    each component is labeled by the linear index of its min pixel.

    Each round: one 8-neighbor min (VPU shifts, carries labels across
    diagonals) then four segmented directional min-scans (left/right/up/down)
    that each propagate along entire unbroken runs in one step. Convergence
    is bounded by the number of "turns" in a component, not its diameter —
    text blobs converge in 1-2 rounds, serpentine worst cases in
    O(#corners). Entirely gather-free."""
    h, w = bitmap.shape
    mask = bitmap > 0
    idx = (jnp.arange(h * w, dtype=jnp.int32).reshape(h, w))
    label = jnp.where(mask, idx, _INF)

    def body(_, label):
        label = jnp.minimum(label, jnp.where(mask, _neighbor_min(label),
                                             _INF))
        for axis in (1, 0):
            for reverse in (False, True):
                label = jnp.minimum(
                    label, _segmented_min_scan(label, mask, axis, reverse))
        return label

    label = jax.lax.fori_loop(0, num_iters, body, label)
    return jnp.where(mask, label, -1)


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

    # compact arbitrary label ids into [0, max_components) slots; background
    # (-1) is mapped to the INF sentinel so the padded unique array stays
    # sorted (searchsorted requirement)
    is_fg = flat_labels >= 0
    fg_labels = jnp.where(is_fg, flat_labels, _INF)
    uniq = jnp.unique(fg_labels, size=max_components + 1, fill_value=_INF)
    slot_of = jnp.minimum(jnp.searchsorted(uniq, fg_labels),
                          max_components)
    keyed = jnp.where(is_fg, slot_of, max_components)

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

    uniq_fg = uniq[:max_components]
    valid = (uniq_fg < _INF) & (count > 0)
    scores = jnp.where(valid, score_sum / jnp.maximum(count, 1.0), 0.0)
    boxes = jnp.stack([xmin, ymin, xmax, ymax], axis=1)
    return boxes, scores, count, valid


def fast_boxes(prob_map, thresh: float = 0.3, box_thresh: float = 0.7,
               min_size: int = 3, max_components: int = 100,
               num_iters: int = 16):
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
