"""Measure the cost of true-OHEM (reduction='none': full-map sort) vs the
reference's degenerate 'mean' inside a full train step on TPU.

Methodology (docs/PERFORMANCE.md): chain STEPS steps inside one jit via
``lax.scan`` with a varying carry (params perturbed by the loss gradient so
XLA cannot hoist the body), force completion with a scalar readback, report
the median of 3 timed scans. Prints one JSON line.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from db_text_minimal_tpu import losses as L
from db_text_minimal_tpu.models import DBTextModel

BS, SIZE, STEPS = 16, 640, 5


model = DBTextModel(dtype=jnp.bfloat16)
variables = model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, SIZE, SIZE, 3)), train=True)
params = variables["params"]
stats = variables["batch_stats"]
rs = np.random.RandomState(0)
img = jnp.asarray(rs.rand(BS, SIZE, SIZE, 3).astype(np.float32))
prob_gt = jnp.asarray((rs.rand(BS, SIZE, SIZE) > 0.9).astype(np.float32))
mask = jnp.ones((BS, SIZE, SIZE), jnp.float32)
tgt = jnp.asarray(rs.rand(BS, SIZE, SIZE).astype(np.float32))
tmask = prob_gt


def make_scan(reduction):
    def one_step(p, img):
        def loss_fn(p):
            preds, mut = model.apply({"params": p, "batch_stats": stats},
                                     img, train=True,
                                     mutable=["batch_stats"])
            out = L.db_loss(preds, prob_gt, mask, tgt, tmask,
                            reduction=reduction)
            return out.total_loss, mut

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        # SGD-like carry update keeps the body loop-variant (no hoisting).
        p = jax.tree_util.tree_map(
            lambda a, g: a - 1e-9 * g.astype(a.dtype), p, grads)
        return p, loss

    @jax.jit
    def scan(params, img):
        params, losses = jax.lax.scan(
            lambda p, _: one_step(p, img), params, None, length=STEPS)
        return losses[-1]

    return scan


def timed(fn, *args, repeats=3):
    float(fn(*args))  # compile + warm
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


if __name__ == "__main__":
    out = {"batch_size": BS, "img_size": SIZE, "steps_per_scan": STEPS,
           "backend": jax.default_backend()}
    for reduction in ("mean", "none"):
        scan = make_scan(reduction)
        dt = timed(scan, params, img) / STEPS
        out[reduction] = {"ms_per_step": round(dt * 1000, 1),
                          "img_per_s": round(BS / dt, 1)}
    out["none_over_mean"] = round(
        out["none"]["ms_per_step"] / out["mean"]["ms_per_step"], 3)
    print(json.dumps(out))
