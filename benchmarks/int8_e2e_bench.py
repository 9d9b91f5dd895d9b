"""Bench the int8 PTQ inference path under ONE jit (lax.scan chained),
exactly like bench.py measures the bf16 path. Compares bf16 fused-head
forward vs quant_dbnet_forward with static calibrated scales."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from db_text_minimal_tpu.models import DBTextModel
from db_text_minimal_tpu.models.head import fuse_variables
from db_text_minimal_tpu.models.quant_infer import (
    calibrate_activation_scales, prepare_quant_params, quant_dbnet_forward)

BS, SIZE, STEPS = 32, 640, 10


def timed(fn, *args, repeats=3):
    float(fn(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


base = DBTextModel(dtype=jnp.bfloat16)
variables = base.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, SIZE, SIZE, 3)), train=False)
fused = fuse_variables(variables)
fmodel = DBTextModel(dtype=jnp.bfloat16, head_name="FusedDBHead")

x = jnp.asarray(np.random.RandomState(0)
                .rand(BS, SIZE, SIZE, 3).astype(np.float32) * 255 - 120)


@partial(jax.jit, static_argnums=(2,))
def fwd_bf16(v, x, n):
    def body(c, _):
        out = fmodel.apply(v, x + c, train=False)
        return out.mean().astype(jnp.float32), None
    s, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
    return s


qv = prepare_quant_params(fuse_variables(jax.device_get(variables)))
qvh = prepare_quant_params(fuse_variables(jax.device_get(variables)), skip=())
# calibrate on 2 small batches (the forward runs on device, slow compile)
cal = np.random.RandomState(1).rand(2, 2, SIZE, SIZE, 3).astype(np.float32) \
    * 255 - 120
qv = calibrate_activation_scales(qv, [cal[0], cal[1]])
qvh = calibrate_activation_scales(qvh, [cal[0], cal[1]])
qv = jax.device_put(qv)


@partial(jax.jit, static_argnums=(2,))
def fwd_int8(v, x, n):
    def body(c, _):
        out = quant_dbnet_forward(v, x + c)
        return out.mean().astype(jnp.float32), None
    s, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
    return s


if __name__ == "__main__":
    dt = timed(fwd_bf16, fused, x, STEPS)
    print(f"bf16 fused-head: {BS*STEPS/dt:8.1f} img/s")
    dt = timed(fwd_int8, qv, x, STEPS)
    print(f"int8 static    : {BS*STEPS/dt:8.1f} img/s")
    dt = timed(fwd_int8, jax.device_put(qvh), x, STEPS)
    print(f"int8 +head     : {BS*STEPS/dt:8.1f} img/s")
