"""Loss tests: hand-computed tiny-tensor checks plus numerical parity with
the reference torch implementation (SURVEY.md §4 plan (a))."""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from db_text_minimal_tpu.losses import (db_loss, db_loss_eval, dice_loss,
                                        masked_l1_loss, ohem_balance_bce)

REFERENCE = "/root/reference/src"


def _rand_maps(rng, shape=(2, 16, 16)):
    pred = rng.rand(*shape).astype(np.float32) * 0.98 + 0.01
    gt = (rng.rand(*shape) > 0.7).astype(np.float32)
    mask = (rng.rand(*shape) > 0.1).astype(np.float32)
    return pred, gt, mask


def test_dice_loss_hand_computed():
    pred = jnp.array([[[1.0, 0.0], [1.0, 0.0]]])
    gt = jnp.array([[[1.0, 1.0], [0.0, 0.0]]])
    mask = jnp.ones_like(gt)
    # inter = 1, union = 2 + 2 -> 1 - 2*1/4 = 0.5
    assert float(dice_loss(pred, gt, mask)) == pytest.approx(0.5, abs=1e-5)


def test_masked_l1_hand_computed():
    pred = jnp.array([[0.5, 0.0]])
    gt = jnp.array([[1.0, 1.0]])
    mask = jnp.array([[1.0, 0.0]])
    assert float(masked_l1_loss(pred, gt, mask)) == pytest.approx(0.5,
                                                                 abs=1e-5)


def test_ohem_true_path_keeps_hardest_negatives():
    # 1 positive, 4 negatives; ratio 3 -> keep 3 hardest negatives
    pred = jnp.array([[0.9, 0.8, 0.6, 0.4, 0.2]])
    gt = jnp.array([[1.0, 0.0, 0.0, 0.0, 0.0]])
    mask = jnp.ones_like(gt)
    got = float(ohem_balance_bce(pred, gt, mask, reduction="none"))
    bce = lambda p, y: -(y * np.log(p) + (1 - y) * np.log(1 - p))
    pos = bce(0.9, 1.0)
    negs = sorted([bce(p, 0.0) for p in (0.8, 0.6, 0.4, 0.2)], reverse=True)
    expected = (pos + sum(negs[:3])) / (1 + 3 + 1e-6)
    assert got == pytest.approx(expected, rel=1e-4)


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference checkout not available")
@pytest.mark.parametrize("reduction", ["mean"])
def test_db_loss_parity_with_reference(rng, reduction):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE)
    try:
        from losses import DBLoss as TorchDBLoss
    finally:
        sys.path.remove(REFERENCE)

    preds = rng.rand(2, 3, 16, 16).astype(np.float32) * 0.98 + 0.01
    prob_gt = (rng.rand(2, 16, 16) > 0.7).astype(np.float32)
    sup = (rng.rand(2, 16, 16) > 0.1).astype(np.float32)
    thr_gt = rng.rand(2, 16, 16).astype(np.float32) * 0.4 + 0.3
    area = (rng.rand(2, 16, 16) > 0.5).astype(np.float32)

    ref = TorchDBLoss(reduction=reduction)
    gts = torch.stack([torch.from_numpy(prob_gt), torch.from_numpy(sup),
                       torch.from_numpy(thr_gt), torch.from_numpy(area)])
    ref_out = ref(torch.from_numpy(preds), gts)
    ref_vals = [float(v) for v in ref_out]

    ours = db_loss(jnp.asarray(np.transpose(preds, (0, 2, 3, 1))),
                   jnp.asarray(prob_gt), jnp.asarray(sup),
                   jnp.asarray(thr_gt), jnp.asarray(area),
                   reduction=reduction)
    for ref_v, our_v in zip(ref_vals, ours):
        assert float(our_v) == pytest.approx(ref_v, rel=1e-4, abs=1e-5)

    # eval branch (2-channel preds)
    ref_eval = ref(torch.from_numpy(preds[:, :2]), gts)
    our_eval = db_loss_eval(
        jnp.asarray(np.transpose(preds[:, :2], (0, 2, 3, 1))),
        jnp.asarray(prob_gt), jnp.asarray(sup), jnp.asarray(thr_gt),
        jnp.asarray(area), reduction=reduction)
    assert float(our_eval) == pytest.approx(float(ref_eval), rel=1e-4)


def test_ohem_jit_with_traced_counts(rng):
    import jax

    pred, gt, mask = _rand_maps(rng)
    f = jax.jit(lambda p, g, m: ohem_balance_bce(p, g, m, reduction="none"))
    v = float(f(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    assert np.isfinite(v) and v > 0


def test_warmup_poly_lr():
    from db_text_minimal_tpu.lr_schedules import warmup_poly_lr

    sched = warmup_poly_lr(base_lr=0.005, warmup_iters=10, max_iters=100)
    lr0 = float(sched(0))
    lr5 = float(sched(5))
    lr10 = float(sched(10))
    assert lr0 == pytest.approx(0.005 / 3, rel=1e-5)   # warmup_factor = 1/3
    assert lr0 < lr5 < lr10
    assert float(sched(100)) == pytest.approx(0.0, abs=1e-8)
    assert lr10 == pytest.approx(0.005, rel=1e-5)


def test_reduce_lr_on_plateau():
    from db_text_minimal_tpu.lr_schedules import ReduceLROnPlateau

    s = ReduceLROnPlateau(factor=0.2, patience=2)
    assert s.step(1.0) == 1.0
    assert s.step(0.9) == 1.0          # improving
    for _ in range(2):                  # 2 bad epochs tolerated
        assert s.step(0.95) == 1.0
    assert s.step(0.95) == pytest.approx(0.2)  # 3rd bad epoch -> cut


def test_topk_sum_matches_sort(rng):
    from db_text_minimal_tpu.losses import _topk_sum

    vals = rng.rand(5000).astype(np.float32) * 12.0
    vals[rng.rand(5000) > 0.6] = 0.0          # masked-out zeros
    vals[:100] = vals[100:200]                # force ties
    for k in (0, 1, 7, 500, 4999):
        want = float(np.sort(vals)[::-1][:k].sum())
        got = float(_topk_sum(jnp.asarray(vals), jnp.float32(k)))
        assert got == pytest.approx(want, rel=1e-5, abs=1e-3), k
    # gradient: selected elements get 1, others 0 (away from ties)
    import jax

    v = jnp.asarray(np.array([5.0, 3.0, 1.0, 0.5], np.float32))
    g = jax.grad(lambda x: _topk_sum(x, jnp.float32(2)))(v)
    np.testing.assert_allclose(np.asarray(g), [1, 1, 0, 0], atol=1e-6)
