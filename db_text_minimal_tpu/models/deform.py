"""Gather-based deformable convolution (DCNv1) in pure JAX.

Replaces ``torchvision.ops.DeformConv2d`` as used by the reference's
deformable ResNet variants (``src/modules/resnet.py:54-65,110-124``):
a 3×3 conv whose 9 sampling locations are shifted per-pixel by learned
offsets (18 channels = 9 × (dy, dx)), offset conv zero-initialized
(``src/modules/resnet.py:204-208``).

Formulated TPU-first: one bilinear gather per kernel tap (static shapes,
9 taps unrolled at trace time) followed by a 1×1 matmul per tap that XLA maps
onto the MXU — no dynamic shapes, no scatter.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .layers import he_normal_torch


def _bilinear_sample(img: jnp.ndarray, y: jnp.ndarray,
                     x: jnp.ndarray) -> jnp.ndarray:
    """Sample NHWC ``img`` at float coords (y, x) of shape (N, H', W').
    Out-of-bounds reads are zero (torch ``DeformConv2d`` semantics)."""
    n, h, w, c = img.shape
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = (y - y0)[..., None]
    wx = (x - x0)[..., None]

    def gather(yy, xx):
        valid = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w))[..., None]
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        vals = jnp.take_along_axis(
            img.reshape(n, h * w, c),
            (yc * w + xc).reshape(n, -1, 1),
            axis=1,
        ).reshape(*yy.shape, c)
        return jnp.where(valid, vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


class DeformConv(nn.Module):
    """3×3 deformable conv, padding 1, optional stride."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        oh = (h + self.stride - 1) // self.stride
        ow = (w + self.stride - 1) // self.stride
        # offset conv: 18 channels, zero-init (resnet.py:204-208 constant_init
        # 0). ALWAYS f32, even when the block computes in bf16: offsets are
        # sampling COORDINATES — bf16's 8-bit mantissa quantizes them to
        # ~1/128 px and adds rounding noise to their gradients, a divergence
        # from the reference (torch keeps this branch f32) with negligible
        # compute to save (18 output channels).
        offsets = nn.Conv(18, (3, 3), strides=(self.stride, self.stride),
                          padding=[(1, 1), (1, 1)],
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          dtype=jnp.float32, name="offset_conv")(x)
        offsets = offsets.reshape(n, oh, ow, 9, 2)

        base_y = (jnp.arange(oh, dtype=jnp.float32) * self.stride)[None, :, None]
        base_x = (jnp.arange(ow, dtype=jnp.float32) * self.stride)[None, None, :]

        # per-tap weights: (3, 3, C_in, C_out) applied as 1x1 matmuls
        kernel = self.param("kernel", he_normal_torch(),
                            (3, 3, c, self.features), jnp.float32)
        out = jnp.zeros((n, oh, ow, self.features), self.dtype)
        xf = x.astype(jnp.float32)
        for ky in range(3):
            for kx in range(3):
                tap = ky * 3 + kx
                dy = offsets[..., tap, 0]
                dx = offsets[..., tap, 1]
                sy = base_y + (ky - 1) + dy
                sx = base_x + (kx - 1) + dx
                sampled = _bilinear_sample(xf, sy, sx)
                out = out + jnp.einsum(
                    "nhwc,cf->nhwf", sampled.astype(self.dtype),
                    kernel[ky, kx].astype(self.dtype))
        return out
