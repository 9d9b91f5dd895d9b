"""On-device kernel tests: fused DB step and connected components, checked
against the host geometry library and plain-jnp references."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from db_text_minimal_tpu.ops import geometry as geo
from db_text_minimal_tpu.ops.pallas import (component_boxes,
                                            connected_components,
                                            fused_db_step)
from db_text_minimal_tpu.ops.pallas.cc import fast_boxes


def test_fused_db_step_matches_reference_math(rng):
    p = rng.rand(2, 64, 128).astype(np.float32)
    t = rng.rand(2, 64, 128).astype(np.float32)
    bhat, bitmap = fused_db_step(jnp.asarray(p), jnp.asarray(t), k=50.0,
                                 thresh=0.3)
    expected_bhat = 1.0 / (1.0 + np.exp(-50.0 * (p - t)))
    np.testing.assert_allclose(np.asarray(bhat), expected_bhat, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(bitmap), (p > 0.3))


def _blob_image():
    img = np.zeros((64, 96), np.float32)
    geo.fill_poly(img, np.array([(5, 5), (30, 5), (30, 20), (5, 20)]))
    geo.fill_poly(img, np.array([(50, 30), (90, 32), (88, 55), (48, 52)]))
    geo.fill_poly(img, np.array([(5, 40), (20, 40), (20, 60), (5, 60)]))
    return img


def test_connected_components_counts_blobs():
    img = _blob_image()
    labels = np.asarray(connected_components(jnp.asarray(img > 0.5,
                                                         jnp.int32)))
    fg = labels[labels >= 0]
    assert len(np.unique(fg)) == 3
    assert (labels[np.asarray(img) == 0] == -1).all()
    # same component count as the host contour tracer (outer borders)
    contours = geo.find_contours((img > 0.5).astype(np.uint8))
    assert len(contours) == 3


def test_connected_components_snake():
    # S-shaped 1px path: pointer jumping must still converge
    img = np.zeros((32, 32), np.int32)
    img[2, 2:30] = 1
    img[2:16, 29] = 1
    img[15, 2:30] = 1
    img[15:30, 2] = 1
    img[29, 2:30] = 1
    labels = np.asarray(connected_components(jnp.asarray(img), num_iters=8))
    assert len(np.unique(labels[labels >= 0])) == 1


def test_component_boxes_stats():
    img = _blob_image()
    prob = img * 0.9
    labels = connected_components(jnp.asarray(img > 0.5, jnp.int32))
    boxes, scores, areas, valid = component_boxes(jnp.asarray(prob), labels,
                                                  max_components=10)
    boxes, scores, valid = map(np.asarray, (boxes, scores, valid))
    assert valid.sum() == 3
    kept = boxes[valid]
    # the first rectangle (5..30, 5..20) must appear as an exact bbox
    assert any(np.allclose(b, [5, 5, 30, 20]) for b in kept)
    assert np.allclose(scores[valid], 0.9, atol=1e-5)


def test_fast_boxes_filters():
    img = _blob_image()
    prob = img * 0.9
    # plus a tiny 2x2 blob that must be dropped by min_size
    prob[0:2, 90:92] = 0.95
    boxes, scores, keep = fast_boxes(jnp.asarray(prob), thresh=0.3,
                                     box_thresh=0.7, min_size=3)
    assert int(np.asarray(keep).sum()) == 3


def test_fast_boxes_low_score_rejected():
    img = _blob_image() * 0.4   # below box_thresh
    _, _, keep = fast_boxes(jnp.asarray(img), thresh=0.3, box_thresh=0.7)
    assert int(np.asarray(keep).sum()) == 0


def _draw_rot_rect(prob, cx, cy, w, h, deg, val=0.95):
    th = np.deg2rad(deg)
    ys, xs = np.mgrid[0:prob.shape[0], 0:prob.shape[1]]
    dx, dy = xs - cx, ys - cy
    u = dx * np.cos(th) + dy * np.sin(th)
    v = -dx * np.sin(th) + dy * np.cos(th)
    prob[(np.abs(u) <= w / 2) & (np.abs(v) <= h / 2)] = val


def _rot_rect_scene():
    prob = np.zeros((160, 160), np.float32)
    _draw_rot_rect(prob, 40, 40, 50, 14, 20)
    _draw_rot_rect(prob, 110, 100, 60, 16, -35)
    _draw_rot_rect(prob, 40, 120, 30, 12, 0)
    return prob


def test_device_boxes_matches_host_rect_mode():
    """On-device oriented boxes vs the host SegDetectorRepresenter rect path
    (contours → minAreaRect → unclip) on rotated rectangles: same count,
    corners within 2.5 px."""
    from db_text_minimal_tpu.ops.pallas.cc import device_boxes
    from db_text_minimal_tpu.postprocess import (SegDetectorRepresenter,
                                                 order_rect_points)

    prob = _rot_rect_scene()
    corners, scores, keep = device_boxes(jnp.asarray(prob)[None],
                                         thresh=0.3, box_thresh=0.7)
    corners = np.asarray(corners[0])[np.asarray(keep[0])]
    dev = sorted((np.array(order_rect_points(c)) for c in corners),
                 key=lambda b: (b[0, 0], b[0, 1]))

    rep = SegDetectorRepresenter(thresh=0.3, box_thresh=0.7)
    boxes, hscores = rep({"shape": [(160, 160)]}, prob[None, ..., None],
                         is_output_polygon=False)
    host = sorted((np.asarray(b, float) for b, s in
                   zip(boxes[0], hscores[0]) if s > 0),
                  key=lambda b: (b[0, 0], b[0, 1]))
    assert len(dev) == len(host) == 3
    for d, h in zip(dev, host):
        assert np.abs(d - h).max() < 2.5, (d, h)
    assert np.all(np.asarray(scores[0])[np.asarray(keep[0])] > 0.9)


def test_connected_components_converges_on_serpentine():
    """Regression: a fixed 16-round propagation split long winding
    components (a 640² spiral needs 32 rounds → 3 fragment labels, each a
    spurious box on recall-heavy models); the convergence-checked loop must
    label it as ONE component."""
    from db_text_minimal_tpu.ops.pallas.cc import connected_components

    size = 640
    m = np.zeros((size, size), np.int32)
    th = np.linspace(0, 6 * np.pi, 4000)
    r = 10 + th * 8
    xs = (320 + r * np.cos(th)).astype(int)
    ys = (320 + r * np.sin(th)).astype(int)
    for x, y in zip(xs, ys):
        if 4 <= x < size - 4 and 4 <= y < size - 4:
            m[y - 3:y + 4, x - 3:x + 4] = 1
    lab = np.asarray(connected_components(jnp.asarray(m)))
    assert len(np.unique(lab[lab >= 0])) == 1


def test_device_boxes_survive_speckle_noise():
    """Regression: component slots are assigned in raster order of each
    component's root pixel, so noise speckles ahead of real text must not
    evict it past ``max_components`` (they did at the old default of 100 —
    measured 2 of 8 words dropped on a 150-speckle 640² map)."""
    from db_text_minimal_tpu.postprocess import (DeviceBoxRepresenter,
                                                 SegDetectorRepresenter)

    rng = np.random.RandomState(1)
    prob = np.zeros((320, 320), np.float32)
    for _ in range(6):
        _draw_rot_rect(prob, rng.randint(40, 280), rng.randint(40, 280),
                       50, 12, rng.uniform(-40, 40), val=0.9)
    for _ in range(140):          # speckles above thresh, below min_size
        x, y = rng.randint(2, 318), rng.randint(2, 318)
        prob[y:y + 2, x:x + 2] = np.maximum(prob[y:y + 2, x:x + 2], 0.4)

    batch = {"shape": [(320, 320)]}
    host = SegDetectorRepresenter(thresh=0.25, box_thresh=0.5)
    dev = DeviceBoxRepresenter(thresh=0.25, box_thresh=0.5)
    hb, hs = host(batch, prob[None, ..., None], is_output_polygon=False)
    db, _ = dev(batch, jnp.asarray(prob)[None, ..., None])
    n_host = sum(1 for s in hs[0] if s > 0)
    assert len(db[0]) == n_host > 0


def test_device_boxes_empty_and_low_score():
    from db_text_minimal_tpu.ops.pallas.cc import device_boxes

    empty = jnp.zeros((1, 64, 64), jnp.float32)
    _, _, keep = device_boxes(empty)
    assert int(np.asarray(keep).sum()) == 0
    low = jnp.asarray(_rot_rect_scene() * 0.4)[None]   # below box_thresh
    _, _, keep = device_boxes(low, thresh=0.3, box_thresh=0.7)
    assert int(np.asarray(keep).sum()) == 0


def test_device_box_representer_contract():
    """DeviceBoxRepresenter matches the SegDetectorRepresenter call contract
    (rect mode): int16 ordered quads scaled to the destination size."""
    from db_text_minimal_tpu.postprocess import DeviceBoxRepresenter

    prob = _rot_rect_scene()
    batch = np.stack([prob, np.zeros_like(prob)])[..., None]
    rep = DeviceBoxRepresenter(thresh=0.3, box_thresh=0.7)
    boxes, scores = rep({"shape": [(320, 320), (320, 320)]},
                        jnp.asarray(batch))
    assert len(boxes) == 2 and len(scores) == 2
    assert boxes[0].shape[1:] == (4, 2) and boxes[0].dtype == np.int16
    assert len(boxes[0]) == 3 and len(boxes[1]) == 0
    # scaled 2x: the axis-aligned box (25..55, 114..126 ± unclip) lands
    # around x≈34..76 in the 320 canvas
    assert boxes[0].max() <= 320 and boxes[0].min() >= 0
    assert boxes[0].max() > 160   # actually scaled, not left at 160


def test_finish_device_rects_edge_cases():
    """Host finishing of device rects: empty input, degenerate quads, and
    the under-min-size drop all behave like the host rect path."""
    from db_text_minimal_tpu.postprocess import finish_device_rects

    boxes, scores = finish_device_rects(
        np.zeros((0, 4, 2), np.float32), np.zeros((0,), np.float32),
        160, 160, 160, 160)
    assert boxes.shape == (0, 4, 2) and scores.shape == (0,)

    quads = np.array([
        [[10, 10], [60, 10], [60, 30], [10, 30]],     # healthy rect
        [[5, 5], [5, 5], [5, 5], [5, 5]],             # degenerate point
        [[100, 100], [101, 100], [101, 101], [100, 101]],  # below min_size
    ], np.float32)
    scores_in = np.array([0.9, 0.8, 0.7], np.float32)
    boxes, scores = finish_device_rects(quads, scores_in, 160, 160, 160, 160)
    assert len(boxes) == 1 and scores.tolist() == [np.float32(0.9)]
    # unclipped output grows the rect (d = A*1.5/L = 50*20*1.5/140 ≈ 10.7)
    w = boxes[0][:, 0].max() - boxes[0][:, 0].min()
    assert 60 < w < 80


def test_db_step_custom_vjp_matches_analytic():
    from db_text_minimal_tpu.ops.pallas.db_step import db_step

    rs = np.random.RandomState(1)
    p = jnp.asarray(rs.rand(2, 16, 128, 1).astype(np.float32))
    t = jnp.asarray(rs.rand(2, 16, 128, 1).astype(np.float32))

    def via_op(p, t):
        return jnp.sum(jnp.cos(db_step(p, t, 50.0)))

    def via_jnp(p, t):
        return jnp.sum(jnp.cos(jax.nn.sigmoid(50.0 * (p - t))))

    gp1, gt1 = jax.grad(via_op, argnums=(0, 1))(p, t)
    gp2, gt2 = jax.grad(via_jnp, argnums=(0, 1))(p, t)
    np.testing.assert_allclose(np.asarray(gp1), np.asarray(gp2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt2), atol=1e-5)


def test_step_timer():
    import time

    from db_text_minimal_tpu.utils.profiling import StepTimer, trace

    t = StepTimer(warmup=1)
    t.tick(4)                      # warmup step — not counted
    time.sleep(0.05)
    t.tick(4)
    assert t.images_per_sec > 0
    with trace(None):              # no-op path
        pass


def test_d2s_deconv_rewrite_exact():
    """The head's 2×2/s2 transposed conv equals the 1×1-conv +
    depth-to-space rewrite tap for tap (``_d2s_deconv_kernel`` — the MXU
    form that avoids the input-dilated conv's structural zeros)."""
    from db_text_minimal_tpu.models.quant_infer import (_d2s_deconv_kernel,
                                                        _fdeconv)

    rs = np.random.RandomState(3)
    for cin, cout in [(64, 64), (64, 1)]:
        k = (rs.randn(2, 2, cin, cout) / np.sqrt(cin)).astype(np.float32)
        b = (rs.randn(cout) * 0.1).astype(np.float32)
        x = jnp.asarray(rs.randn(2, 8, 12, cin).astype(np.float32))
        ref = _fdeconv(x, {"kernel": k, "bias": b}, relu=True)
        new = _fdeconv(x, {"kernel": _d2s_deconv_kernel(k), "bias": b},
                       relu=True)
        assert new.shape == ref.shape == (2, 16, 24, cout)
        np.testing.assert_allclose(np.asarray(new), np.asarray(ref),
                                   atol=1e-6)


def test_quant_inference_runs_and_tracks_float():
    """Int8 PTQ path (BN folded, wide convs int8, head/narrow convs bf16):
    runs and stays close to the float forward away from sigmoid cliffs."""
    import jax
    import jax.numpy as jnp

    from db_text_minimal_tpu.models import DBTextModel
    from db_text_minimal_tpu.models.head import fuse_variables
    from db_text_minimal_tpu.models.quant_infer import (
        calibrate_activation_scales, prepare_quant_params,
        quant_dbnet_forward)

    m = DBTextModel()
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32)
        * 255 - 115)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    ref = np.asarray(m.apply(v, x, train=False))
    qv = prepare_quant_params(fuse_variables(jax.device_get(v)))
    qp = qv["params"]
    # narrow convs stay float (stem 3->64, layer1 64ch, FPN 64ch, head)
    assert qp["backbone"]["conv1"]["kernel"].dtype == np.float32
    assert qp["backbone"]["layer1_0"]["conv1"]["kernel"].dtype == np.float32
    assert qp["segmentation_body"]["smooth_p2"]["kernel"].dtype == np.float32
    assert qp["segmentation_head"]["conv1"]["kernel"].dtype == np.float32
    # wide convs are int8
    assert qp["backbone"]["layer3_0"]["conv1"]["kernel"].dtype == np.int8
    assert qp["segmentation_body"]["conv"]["kernel"].dtype == np.int8
    out = np.asarray(quant_dbnet_forward(qv, x))
    assert out.shape == ref.shape
    assert np.abs(out - ref).mean() < 0.02
    # static calibration: every int8 conv gets an act_scale; output close
    qv = calibrate_activation_scales(qv, [np.asarray(x)])
    assert "act_scale" in qp["backbone"]["layer3_0"]["conv1"]
    out2 = np.asarray(quant_dbnet_forward(qv, x))
    assert np.abs(out2 - ref).mean() < 0.02


def test_s2d_stem_and_prob_only_match_standard_forward():
    """Space-to-depth stem is weight-equivalent to the 7×7/s2 stem, and
    prob_only returns exactly the prob channel of the full forward."""
    import jax
    import jax.numpy as jnp

    from db_text_minimal_tpu.models import DBTextModel
    from db_text_minimal_tpu.models.head import fuse_variables
    from db_text_minimal_tpu.models.quant_infer import (
        prepare_quant_params, quant_dbnet_forward)

    m = DBTextModel()
    x = jnp.asarray(
        np.random.RandomState(1).rand(1, 128, 128, 3).astype(np.float32)
        * 255 - 115)
    v = fuse_variables(jax.device_get(
        m.init(jax.random.PRNGKey(1), x, train=False)))
    # no quantization (thresholds unreachable) isolates the stem rewrite
    base = prepare_quant_params(v, min_out_channels=10**9)
    s2d = prepare_quant_params(v, min_out_channels=10**9, stem_s2d=True)
    assert s2d["params"]["backbone"]["conv1"]["kernel"].shape[:3] \
        == (4, 4, 12)
    out = np.asarray(quant_dbnet_forward(base, x))
    out_s2d = np.asarray(quant_dbnet_forward(s2d, x))
    # bf16 conv compute: identical taps, different summation order
    assert np.abs(out_s2d - out).max() < 2e-2
    assert np.abs(out_s2d - out).mean() < 1e-3

    prob = np.asarray(quant_dbnet_forward(s2d, x, prob_only=True))
    assert prob.shape == out.shape[:3] + (1,)
    np.testing.assert_array_equal(
        prob[..., 0], np.asarray(
            quant_dbnet_forward(s2d, x))[..., 0])
