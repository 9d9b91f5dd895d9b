"""Measure the cost of true-OHEM (reduction='none': full-map sort) vs the
reference's degenerate 'mean' inside a full train step on TPU."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from db_text_minimal_tpu import losses as L
from db_text_minimal_tpu.models import DBTextModel

BS, SIZE, STEPS = 16, 640, 5


def timed(fn, *args, repeats=3):
    float(fn(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


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


def make_step(reduction):
    @partial(jax.jit, static_argnums=())
    def step(params, stats, img):
        def loss_fn(p):
            preds, mut = model.apply({"params": p, "batch_stats": stats},
                                     img, train=True,
                                     mutable=["batch_stats"])
            out = L.db_loss(preds, prob_gt, mask, tgt, tmask,
                            reduction=reduction)
            return out.total_loss, mut

        (loss, _), grads = jax.value_and_grad(loss_fn,
                                              has_aux=True)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        return loss + sum(jnp.sum(jnp.abs(g)).astype(jnp.float32) * 0
                          for g in leaves[:1])
    return step


if __name__ == "__main__":
    for reduction in ("mean", "none"):
        step = make_step(reduction)
        dt = timed(step, params, stats, img)
        print(f"reduction={reduction:5s}: {dt*1000:8.1f} ms/step "
              f"(bs {BS}, {BS/dt:6.1f} img/s)")
