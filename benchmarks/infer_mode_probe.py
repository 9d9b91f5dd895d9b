"""End-to-end throughput probe of the inference-mode matrix: flax bf16,
folded bf16, int8 PTQ, quantized fused-head conv1, space-to-depth stem,
prob-only head — all at 640², batch 32.

Methodology (docs/PERFORMANCE.md): 20 forwards chained in one jit via
``lax.scan`` (input perturbed by the carry so nothing folds away), median
of 3 timed scans after a warm-up, scalar readback forces completion.
Run from the repo root (copy there first if needed). Prints one JSON line.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BS, SIZE, STEPS = 32, 640, 20


def timed_scan(forward, x, repeats=3):
    @jax.jit
    def scan(x):
        def body(carry, _):
            out = forward(x + carry)
            return out.mean().astype(jnp.float32), None
        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=STEPS)
        return s

    float(scan(x))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(scan(x))
        ts.append(time.perf_counter() - t0)
    dt = sorted(ts)[len(ts) // 2]
    return BS * STEPS / dt


def main():
    from db_text_minimal_tpu.models import DBTextModel
    from db_text_minimal_tpu.models.head import fuse_variables
    from db_text_minimal_tpu.models.quant_infer import (
        DEFAULT_SKIP, calibrate_activation_scales, prepare_quant_params,
        quant_dbnet_forward)

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    base = DBTextModel(dtype=dtype)
    v = base.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)),
                  train=False)
    fused_v = fuse_variables(jax.device_get(v))
    flax_fused = DBTextModel(dtype=dtype, head_name="FusedDBHead")

    x = jnp.asarray(np.random.RandomState(0)
                    .rand(BS, SIZE, SIZE, 3).astype(np.float32) * 255 - 115)
    cal = np.asarray(x[:2])

    def prep(**kw):
        qv = prepare_quant_params(fused_v, **kw)
        if any(n.get("kernel") is not None and n["kernel"].dtype == np.int8
               for n in jax.tree_util.tree_leaves(
                   qv, is_leaf=lambda n: isinstance(n, dict)
                   and "kernel" in n)):
            qv = calibrate_activation_scales(qv, [cal])
        return jax.device_put(qv)

    # deconv_d2s measured 13 % SLOWER (see models/quant_infer) — default off
    configs = {
        "flax_bf16_fused": (None, {}),
        "folded_bf16": (dict(min_out_channels=10**9), {}),
        "folded_bf16_d2s": (dict(min_out_channels=10**9,
                                 deconv_d2s=True), {}),
        "folded_bf16_s2d": (dict(min_out_channels=10**9, stem_s2d=True), {}),
        "folded_bf16_prob": (dict(min_out_channels=10**9),
                             dict(prob_only=True)),
        "folded_bf16_s2d_prob": (dict(min_out_channels=10**9,
                                      stem_s2d=True), dict(prob_only=True)),
        "int8": (dict(skip=DEFAULT_SKIP), {}),
        "int8_head": (dict(skip=()), {}),
        "int8_head_s2d": (dict(skip=(), stem_s2d=True), {}),
        "int8_head_prob": (dict(skip=()), dict(prob_only=True)),
        "int8_head_s2d_prob": (dict(skip=(), stem_s2d=True),
                               dict(prob_only=True)),
    }
    out = {"batch_size": BS, "img_size": SIZE, "steps": STEPS,
           "backend": jax.default_backend()}
    for name, (prep_kw, fwd_kw) in configs.items():
        if prep_kw is None:
            fwd = lambda xx: flax_fused.apply(fused_v, xx, train=False)
        else:
            qv = prep(**prep_kw)
            fwd = partial(quant_dbnet_forward, qv, **fwd_kw)
        ips = timed_scan(fwd, x)
        out[name] = round(ips, 1)
        print(f"# {name}: {ips:.1f} img/s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
