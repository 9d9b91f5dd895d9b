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


# ---------------------------------------------------------------------------
# Differentiable DB step for the TRAINING forward (the production caller:
# models/head.py DBHead train mode). Forward is the Pallas kernel on TPU;
# backward is the analytic σ' rule, elementwise, fused by XLA into the rest
# of the backward pass.
# ---------------------------------------------------------------------------

def _bhat_kernel(p_ref, t_ref, k_ref, out_ref):
    out_ref[:] = jax.nn.sigmoid(k_ref[0] * (p_ref[:] - t_ref[:]))


@functools.partial(jax.jit, static_argnames=("block_rows",))
def _bhat_tpu(p2d, t2d, k, block_rows: int = 512):
    rows, cols = p2d.shape
    grid = (pl.cdiv(rows, block_rows),)
    spec = pl.BlockSpec((block_rows, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bhat_kernel,
        grid=grid,
        in_specs=[spec, spec, pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.float32),
    )(p2d, t2d, jnp.asarray([k], jnp.float32))


def _db_step_impl(p, t, k):
    if jax.default_backend() == "tpu" and p.shape == t.shape and p.ndim >= 2:
        cols = p.shape[-1] if p.shape[-1] >= 128 else p.shape[-2]
        p2 = p.astype(jnp.float32).reshape(-1, cols)
        t2 = t.astype(jnp.float32).reshape(-1, cols)
        return _bhat_tpu(p2, t2, float(k)).reshape(p.shape)
    return jax.nn.sigmoid(k * (p.astype(jnp.float32)
                               - t.astype(jnp.float32)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def db_step(p: jnp.ndarray, t: jnp.ndarray, k: float = 50.0):
    """Differentiable binarization ``B̂ = σ(k(P − T))`` (reference
    ``src/modules/segmentation_head.py:106-108``) with a guaranteed-fused
    Pallas forward on TPU and the analytic VJP
    ``dP = g·k·B̂(1−B̂)``, ``dT = −dP``."""
    return _db_step_impl(p, t, k)


def _db_step_fwd(p, t, k):
    b = _db_step_impl(p, t, k)
    return b, b


def _db_step_bwd(k, b, g):
    dp = g * (k * b * (1.0 - b))
    return dp, -dp


db_step.defvjp(_db_step_fwd, _db_step_bwd)
