"""Shared model building blocks and resize primitives.

TPU-native counterparts of ``src/modules/basic.py`` (ConvBnRelu) and the two
torch interpolation modes the reference mixes (SURVEY.md §7 hard part (c)):
- nearest-neighbor ``F.interpolate(x, size)`` inside the FPN
  (``src/modules/segmentation_body.py:79-87``)
- bilinear ``align_corners=True`` at the model output
  (``src/models.py:43-46``).

Everything is NHWC (channels-last), the layout the TPU convolution engine
prefers; compute dtype is configurable (bf16 by default on TPU) with f32
parameters and batch-norm statistics.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def he_normal_torch():
    """torch ``kaiming_normal_`` / the reference ResNet's
    ``normal_(0, sqrt(2/n))`` with n = fan_out of the conv kernel
    (``src/modules/resnet.py:197-200``)."""
    return nn.initializers.variance_scaling(2.0, "fan_out",
                                            "truncated_normal")


class ConvBnRelu(nn.Module):
    """conv + batch-norm + relu (``src/modules/basic.py:7-36``)."""

    out_channels: int
    kernel_size: int = 3
    strides: int = 1
    padding: Any = 0
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(self.out_channels,
                    (self.kernel_size, self.kernel_size),
                    strides=(self.strides, self.strides),
                    padding=pad,
                    use_bias=self.use_bias,
                    kernel_init=he_normal_torch(),
                    dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=0.9,
                         epsilon=1e-5,
                         dtype=jnp.float32,
                         name="bn")(x)
        return nn.relu(x)


def resize_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """torch ``F.interpolate(x, size)`` (default mode='nearest') for NHWC:
    src index = floor(dst * in / out). Matches
    ``src/modules/segmentation_body.py:79-87`` semantics."""
    n, h, w, c = x.shape
    oh, ow = size
    if (h, w) == (oh, ow):
        return x
    rows = (jnp.arange(oh) * h // oh).astype(jnp.int32)
    cols = (jnp.arange(ow) * w // ow).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def _linear_matrix(in_size: int, out_size: int, dtype) -> jnp.ndarray:
    """(out, in) interpolation matrix for 1-D bilinear with
    align_corners=True: src = dst * (in-1)/(out-1)."""
    if out_size == 1 or in_size == 1:
        return jnp.ones((out_size, in_size), dtype) / in_size
    src = jnp.arange(out_size, dtype=jnp.float32) * (in_size - 1) / (out_size - 1)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    frac = src - lo
    m = (jnp.zeros((out_size, in_size), jnp.float32)
         .at[jnp.arange(out_size), lo].add(1.0 - frac)
         .at[jnp.arange(out_size), hi].add(frac))
    return m.astype(dtype)


def resize_bilinear_align_corners(x: jnp.ndarray,
                                  size: tuple[int, int]) -> jnp.ndarray:
    """torch ``F.interpolate(mode='bilinear', align_corners=True)`` for NHWC
    (``src/models.py:43-46``). Separable: expressed as two matmuls so XLA can
    put the work on the MXU instead of gather units."""
    n, h, w, c = x.shape
    oh, ow = size
    if (h, w) == (oh, ow):
        return x
    mh = _linear_matrix(h, oh, x.dtype)     # (oh, h)
    mw = _linear_matrix(w, ow, x.dtype)     # (ow, w)
    # tiny matmuls on the output maps: full precision keeps thresholding
    # parity with the reference without measurable cost
    hp = jax.lax.Precision.HIGHEST
    x = jnp.einsum("oh,nhwc->nowc", mh, x, precision=hp)
    x = jnp.einsum("pw,nowc->nopc", mw, x, precision=hp)
    return x


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """torch ``MaxPool2d(kernel_size=3, stride=2, padding=1)``
    (``src/modules/resnet.py:180``)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
