"""FPN neck (and the FPEM_FFM / PANnet alternative) in Flax.

TPU-native rebuild of ``src/modules/segmentation_body.py``: ``FPN`` (:11-87)
— 1×1 reduce convs to inner/4 channels, nearest-upsample top-down adds, 3×3
smooth convs, upsample-all-and-concat to p2 scale, final 3×3 conv+BN+relu
(out_channels = inner_channels = 256). ``FPEM_FFM`` (:90-151) with ``FPEM``
(:154-177) and ``SeparableConv2d`` (:180-201) is also provided; the reference
defines but does not register it (``src/models.py:9``) — here it is registered.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import ConvBnRelu, Dtype, he_normal_torch, resize_nearest


class FPN(nn.Module):
    """``src/modules/segmentation_body.py:11-87``."""

    inner_channels: int = 256
    dtype: Dtype = jnp.float32
    # structured-pruning overrides (models/prune.py): width of the tied
    # reduce/smooth add-chain (default inner_channels//4) and of the final
    # output conv (default inner_channels)
    inner_quarter: int | None = None
    out_features: int | None = None

    @property
    def out_channels(self) -> int:
        return self.out_features or self.inner_channels

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c2, c3, c4, c5 = feats
        inner = self.inner_quarter or self.inner_channels // 4

        reduce = lambda name: ConvBnRelu(inner, kernel_size=1,
                                         dtype=self.dtype, name=name)
        smooth = lambda name: ConvBnRelu(inner, kernel_size=3, padding=1,
                                         dtype=self.dtype, name=name)

        p5 = reduce("reduce_conv_c5")(c5, train=train)
        p4 = resize_nearest(p5, c4.shape[1:3]) + \
            reduce("reduce_conv_c4")(c4, train=train)
        p4 = smooth("smooth_p4")(p4, train=train)
        p3 = resize_nearest(p4, c3.shape[1:3]) + \
            reduce("reduce_conv_c3")(c3, train=train)
        p3 = smooth("smooth_p3")(p3, train=train)
        p2 = resize_nearest(p3, c2.shape[1:3]) + \
            reduce("reduce_conv_c2")(c2, train=train)
        p2 = smooth("smooth_p2")(p2, train=train)

        size = p2.shape[1:3]
        x = jnp.concatenate([
            p2,
            resize_nearest(p3, size),
            resize_nearest(p4, size),
            resize_nearest(p5, size),
        ], axis=-1)
        # final conv + BN + relu (segmentation_body.py:56-62)
        x = nn.Conv(self.out_features or self.inner_channels, (3, 3),
                    padding=[(1, 1), (1, 1)],
                    kernel_init=he_normal_torch(), dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="conv_bn")(x)
        return nn.relu(x)


class SeparableConv2d(nn.Module):
    """``src/modules/segmentation_body.py:180-201``."""

    out_channels: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = nn.Conv(c, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], feature_group_count=c,
                    kernel_init=he_normal_torch(), dtype=self.dtype,
                    name="depthwise_conv")(x)
        x = nn.Conv(self.out_channels, (1, 1),
                    kernel_init=he_normal_torch(), dtype=self.dtype,
                    name="pointwise_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class FPEM(nn.Module):
    """``src/modules/segmentation_body.py:154-177``."""

    in_channels: int = 128
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c2, c3, c4, c5, train: bool = False):
        def up_add(x, y):
            return resize_nearest(x, y.shape[1:3]) + y

        sep = lambda name, stride=1: SeparableConv2d(
            self.in_channels, stride=stride, dtype=self.dtype, name=name)
        # up phase
        c4 = sep("up_add1")(up_add(c5, c4), train=train)
        c3 = sep("up_add2")(up_add(c4, c3), train=train)
        c2 = sep("up_add3")(up_add(c3, c2), train=train)
        # down phase
        c3 = sep("down_add1", 2)(up_add(c3, c2), train=train)
        c4 = sep("down_add2", 2)(up_add(c4, c3), train=train)
        c5 = sep("down_add3", 2)(up_add(c5, c4), train=train)
        return c2, c3, c4, c5


class FPEM_FFM(nn.Module):
    """``src/modules/segmentation_body.py:90-151`` (PANnet neck)."""

    inner_channels: int = 128
    fpem_repeat: int = 2
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.inner_channels * 4

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c2, c3, c4, c5 = feats
        reduce = lambda name: ConvBnRelu(self.inner_channels, kernel_size=1,
                                         dtype=self.dtype, name=name)
        c2 = reduce("reduce_conv_c2")(c2, train=train)
        c3 = reduce("reduce_conv_c3")(c3, train=train)
        c4 = reduce("reduce_conv_c4")(c4, train=train)
        c5 = reduce("reduce_conv_c5")(c5, train=train)

        ffm = None
        for i in range(self.fpem_repeat):
            c2, c3, c4, c5 = FPEM(self.inner_channels, dtype=self.dtype,
                                  name=f"fpem_{i}")(c2, c3, c4, c5,
                                                    train=train)
            if ffm is None:
                ffm = [c2, c3, c4, c5]
            else:
                ffm = [a + b for a, b in zip(ffm, (c2, c3, c4, c5))]

        size = ffm[0].shape[1:3]
        return jnp.concatenate(
            [ffm[0]] + [resize_nearest(f, size) for f in ffm[1:]], axis=-1)


NECKS = {"FPN": FPN, "FPEM_FFM": FPEM_FFM}
