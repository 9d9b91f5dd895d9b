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


def test_quant_inference_runs_and_tracks_float():
    """Experimental int8 PTQ path (head kept float): runs and stays close
    to the float forward away from sigmoid cliffs."""
    import jax
    import jax.numpy as jnp

    from db_text_minimal_tpu.models import DBTextModel
    from db_text_minimal_tpu.models.quant_infer import (
        prepare_quant_params, quant_dbnet_forward)

    m = DBTextModel()
    x = jnp.asarray(
        np.random.RandomState(0).rand(1, 128, 128, 3).astype(np.float32)
        * 255 - 115)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    ref = np.asarray(m.apply(v, x, train=False))
    qv = prepare_quant_params(jax.device_get(v))
    # head kernels stay float; backbone kernels are int8
    assert qv["params"]["backbone"]["conv1"]["kernel"].dtype == np.int8
    assert "kernel_scale" not in \
        qv["params"]["segmentation_head"]["binarize"]["conv1"]
    out = np.asarray(quant_dbnet_forward(qv, x))
    assert out.shape == ref.shape
    assert np.abs(out - ref).mean() < 0.02
