"""Micro-probe: where does the int8 inference path lose to bf16?

Times a chain of 3x3 256->256 convs at 160x160 (the FPN hot shape,
docs/PERFORMANCE.md) in three formulations:
  bf16   : conv -> BN+relu (XLA epilogue)            [baseline]
  int8x  : static-scale quant -> int8 conv(int32) -> dequant+BN+relu+requant
           (all elementwise left to XLA)
  int8p  : same but the inter-conv elementwise chain is ONE Pallas kernel
           (int32 in -> int8 out, scales/bias in SMEM)
Each timed scan chains STEPS iterations with a varying carry.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS, H, W, C = 16, 160, 160, 256
DEPTH = 4          # convs per iteration
STEPS = 8
DIMNUM = ("NHWC", "HWIO", "NHWC")


def timed(fn, *args, repeats=3):
    float(fn(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def conv(x, k, ptype=None):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, k.shape, DIMNUM),
        preferred_element_type=ptype)


rs = np.random.RandomState(0)
k_f = [rs.randn(3, 3, C, C).astype(np.float32) * 0.05 for _ in range(DEPTH)]
gamma = [np.abs(rs.randn(C).astype(np.float32)) * 0.2 + 0.9
         for _ in range(DEPTH)]
beta = [rs.randn(C).astype(np.float32) * 0.1 for _ in range(DEPTH)]
x0 = rs.rand(BS, H, W, C).astype(np.float32)

# --- bf16 baseline ---------------------------------------------------------
kb = [jnp.asarray(k, jnp.bfloat16) for k in k_f]
gb = [jnp.asarray(g) for g in gamma]
bb = [jnp.asarray(b) for b in beta]


@jax.jit
def run_bf16(x0):
    def body(carry, _):
        x = carry
        for i in range(DEPTH):
            y = conv(x.astype(jnp.bfloat16), kb[i])
            x = jax.nn.relu(y.astype(jnp.float32) * gb[i] + bb[i])
        return x, None

    out, _ = jax.lax.scan(body, x0, None, length=STEPS)
    return out.mean()


# --- int8, XLA elementwise -------------------------------------------------
def quant_k(k):
    amax = np.abs(k).max(axis=(0, 1, 2), keepdims=True)
    s = np.maximum(amax / 127.0, 1e-12)
    return (np.clip(np.round(k / s), -127, 127).astype(np.int8),
            s.reshape(-1).astype(np.float32))


kq, ks = zip(*[quant_k(k) for k in k_f])
kq = [jnp.asarray(k) for k in kq]
# effective per-channel scale folding BN gamma: out = relu(conv*sx*sk*g + b)
ACT_SCALE = 4.0 / 127.0     # static activation scale (values in [0, ~4])


@jax.jit
def run_int8_xla(x0):
    def body(carry, _):
        x = carry
        for i in range(DEPTH):
            q = jnp.clip(jnp.round(x * (1.0 / ACT_SCALE)), -127,
                         127).astype(jnp.int8)
            y = conv(q, kq[i], ptype=jnp.int32)
            eff = jnp.asarray(ks[i]) * ACT_SCALE * gb[i]
            x = jax.nn.relu(y.astype(jnp.float32) * eff + bb[i])
        return x, None

    out, _ = jax.lax.scan(body, x0, None, length=STEPS)
    return out.mean()


# --- int8, Pallas epilogue (int32 -> int8 directly) -------------------------
def _epi_kernel(y_ref, eff_ref, bias_ref, out_ref):
    y = y_ref[:].astype(jnp.float32)
    z = jnp.maximum(y * eff_ref[:] + bias_ref[:], 0.0)
    out_ref[:] = jnp.clip(jnp.round(z * (1.0 / ACT_SCALE)), -127,
                          127).astype(jnp.int8)


@partial(jax.jit, static_argnames=("block",))
def epilogue(y, eff, bias, block=4):
    n, h, w, c = y.shape
    grid = (n, pl.cdiv(h, block))
    spec = pl.BlockSpec((1, block, w, c), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((c,), lambda i, j: (0,), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _epi_kernel, grid=grid,
        in_specs=[spec, vspec, vspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), jnp.int8),
    )(y, eff, bias)


@jax.jit
def run_int8_pallas(x0):
    q0 = jnp.clip(jnp.round(x0 * (1.0 / ACT_SCALE)), -127,
                  127).astype(jnp.int8)

    def body(carry, _):
        q = carry
        for i in range(DEPTH):
            y = conv(q, kq[i], ptype=jnp.int32)
            eff = jnp.asarray(ks[i]) * ACT_SCALE * gb[i]
            q = epilogue(y, eff, bb[i])
        return q, None

    out, _ = jax.lax.scan(body, q0, None, length=STEPS)
    return out.astype(jnp.float32).mean()


if __name__ == "__main__":
    x = jnp.asarray(x0)
    n_conv = DEPTH * STEPS
    for name, fn in [("bf16", run_bf16), ("int8_xla", run_int8_xla),
                     ("int8_pallas", run_int8_pallas)]:
        try:
            dt = timed(fn, x)
            print(f"{name:12s} {dt*1000:8.1f} ms total  "
                  f"{dt*1000/n_conv:6.2f} ms/conv")
        except Exception as e:
            print(f"{name:12s} FAILED: {type(e).__name__}: {e}")
