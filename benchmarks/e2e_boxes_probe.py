"""End-to-end DETECT throughput probe: int8 prob-only forward + on-device
box postprocess (threshold → CC → oriented rects) fused in ONE jit scan —
the complete serving ``mode=boxes`` device work per image, vs the forward
alone and the box kernel alone.

All three measurements run in one process (the tunnel chip shows ±6 %
session-to-session variance; only within-process ratios are comparable —
docs/PERFORMANCE.md run-to-run note). Copy to the repo root to run
(PYTHONPATH breaks the axon plugin):

    python e2e_boxes_probe.py [--batch 32] [--steps 10] [--out FILE]
"""

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _median_time(fn, repeats=3):
    fn()  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--out", default="demo/hard_bench/e2e_boxes_probe.json")
    opt = ap.parse_args()

    from db_text_minimal_tpu.models import DBTextModel
    from db_text_minimal_tpu.models.head import fuse_variables
    from db_text_minimal_tpu.models.quant_infer import (
        calibrate_activation_scales, prepare_quant_params,
        quant_dbnet_forward)
    from db_text_minimal_tpu.ops.pallas.cc import device_boxes

    size, bs, steps = opt.size, opt.batch, opt.steps
    base = DBTextModel(dtype=jnp.bfloat16)
    variables = base.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, size, size, 3)), train=False)
    rng = np.random.RandomState(0)
    x = rng.rand(bs, size, size, 3).astype(np.float32) * 255 - 120
    qv = prepare_quant_params(fuse_variables(variables), skip=())
    qv = jax.device_put(calibrate_activation_scales(qv, [x[:2]]))
    xd = jnp.asarray(x)

    boxes_kw = dict(thresh=0.25, box_thresh=0.5, min_size=3,
                    max_components=1000, unclip=False)

    @partial(jax.jit, static_argnums=(2,))
    def fwd_n(v, x, n):
        def body(carry, _):
            out = quant_dbnet_forward(v, x + carry, prob_only=True)
            return out.mean().astype(jnp.float32), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return s

    @partial(jax.jit, static_argnums=(2,))
    def e2e_n(v, x, n):
        def body(carry, _):
            prob = quant_dbnet_forward(v, x + carry,
                                       prob_only=True)[..., 0]
            corners, scores, keep = device_boxes(prob, **boxes_kw)
            return (corners.mean() + scores.mean()
                    + keep.sum()).astype(jnp.float32), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return s

    # box kernel alone over a realistic map (a few rectangles of text)
    prob_np = np.zeros((bs, size, size), np.float32)
    r = np.random.RandomState(1)
    for i in range(bs):
        for _ in range(12):
            y, xx = r.randint(0, size - 40, 2)
            h, w = r.randint(8, 40), r.randint(20, 120)
            prob_np[i, y:y + h, xx:xx + w] = r.uniform(0.6, 0.95)
    probd = jnp.asarray(prob_np)

    @partial(jax.jit, static_argnums=(1,))
    def boxes_n(p, n):
        def body(carry, _):
            corners, scores, keep = device_boxes(p + carry * 0, **boxes_kw)
            return (corners.mean() + scores.mean()
                    + keep.sum()).astype(jnp.float32), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return s

    res = {"batch": bs, "steps": steps,
           "backend": jax.default_backend()}
    t = _median_time(lambda: float(fwd_n(qv, xd, steps)))
    res["forward_img_s"] = round(bs * steps / t, 1)
    t = _median_time(lambda: float(e2e_n(qv, xd, steps)))
    res["e2e_boxes_img_s"] = round(bs * steps / t, 1)
    t = _median_time(lambda: float(boxes_n(probd, steps)))
    res["box_kernel_img_s"] = round(bs * steps / t, 1)
    res["postprocess_overhead_pct"] = round(
        100.0 * (res["forward_img_s"] / res["e2e_boxes_img_s"] - 1.0), 1)
    print(json.dumps(res, indent=1))
    with open(opt.out, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
