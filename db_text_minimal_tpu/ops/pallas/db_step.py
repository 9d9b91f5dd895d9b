"""Fused differentiable-binarization step kernel.

Computes, in one VMEM pass over the prob/threshold maps:
- the approximate binary map ``B̂ = σ(k·(P − T))`` (the DB head's
  ``step_function``, reference ``src/modules/segmentation_head.py:106-108``)
- the hard bitmap ``P > thresh`` used by postprocess binarization
  (``src/postprocess.py:51``).

This is the BASELINE.json north-star fusion item ("the DB head's
sigmoid(k(P−T)) approximate-binary map fused ... into a single XLA kernel").
XLA usually fuses these elementwise ops on its own; the Pallas kernel
guarantees the fusion, keeps both outputs in one HBM read of P/T, and is the
template for further head fusions. Falls back to plain jnp off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(p_ref, t_ref, k_ref, thresh_ref, bhat_ref, bitmap_ref):
    k = k_ref[0]
    thresh = thresh_ref[0]
    p = p_ref[:]
    bhat_ref[:] = jax.nn.sigmoid(k * (p - t_ref[:]))
    bitmap_ref[:] = (p > thresh).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def _fused_tpu(p, t, k, thresh, block_rows: int = 256):
    n, h, w = p.shape
    grid = (n, pl.cdiv(h, block_rows))
    spec = pl.BlockSpec((1, block_rows, w), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[spec, spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((n, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((n, h, w), jnp.float32)),
    )(p.astype(jnp.float32), t.astype(jnp.float32),
      jnp.asarray([k], jnp.float32), jnp.asarray([thresh], jnp.float32))


def fused_db_step(prob_map: jnp.ndarray, thresh_map: jnp.ndarray,
                  k: float = 50.0, thresh: float = 0.3):
    """(N, H, W) prob/thresh maps → (B̂, hard bitmap) in one pass."""
    if jax.default_backend() == "tpu":
        return _fused_tpu(prob_map, thresh_map, float(k), float(thresh))
    p = prob_map.astype(jnp.float32)
    bhat = jax.nn.sigmoid(k * (p - thresh_map.astype(jnp.float32)))
    return bhat, (p > thresh).astype(jnp.float32)
