"""Flax ResNet backbones returning multi-scale features c2..c5.

TPU-native rebuild of ``src/modules/resnet.py``: ``BasicBlock`` (:37),
``Bottleneck`` (:94), ``ResNet`` (:162) and the constructors
``resnet18/34/50/101/152`` (:245-330) plus the deformable variants
(``deformable_resnet18`` :258, ``deformable_resnet50`` :295, DCN via
``torchvision.ops.DeformConv2d`` :54-65) — here a gather-based JAX
deformable conv (``deform.py``).

Features are NHWC at strides 4/8/16/32 with channel widths
[64, 128, 256, 512] × expansion (``src/modules/resnet.py:231-242``).
The reference's unused ImageNet head (avgpool/fc, :192-193) and the stray
``smooth`` conv (:195) are intentionally omitted — they are never called in
its forward pass.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .layers import Dtype, he_normal_torch, max_pool_3x3_s2
from .deform import DeformConv


def _bn(train: bool, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32, name=name)


def _conv(features: int, kernel: int, stride: int = 1, name: str = "conv",
          dtype=jnp.float32):
    pad = (kernel - 1) // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)], use_bias=False,
                   kernel_init=he_normal_torch(), dtype=dtype, name=name)


class BasicBlock(nn.Module):
    """``src/modules/resnet.py:37-91`` (expansion = 1).

    ``hidden_planes`` overrides conv1's output width — the block-internal
    channels are free of residual-chain ties, so structured pruning
    (``models/prune.py``) physically shrinks them."""

    planes: int
    stride: int = 1
    downsample: bool = False
    with_dcn: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 1
    hidden_planes: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        hidden = self.hidden_planes or self.planes
        out = _conv(hidden, 3, self.stride, "conv1", self.dtype)(x)
        out = _bn(train, "bn1")(out)
        out = nn.relu(out)
        if self.with_dcn:
            out = DeformConv(self.planes, dtype=self.dtype, name="conv2")(out)
        else:
            out = _conv(self.planes, 3, 1, "conv2", self.dtype)(out)
        out = _bn(train, "bn2")(out)
        if self.downsample:
            residual = _conv(self.planes * self.expansion, 1, self.stride,
                             "downsample_conv", self.dtype)(x)
            residual = _bn(train, "downsample_bn")(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """``src/modules/resnet.py:94-159`` (expansion = 4)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    with_dcn: bool = False
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = _conv(self.planes, 1, 1, "conv1", self.dtype)(x)
        out = _bn(train, "bn1")(out)
        out = nn.relu(out)
        if self.with_dcn:
            out = DeformConv(self.planes, stride=self.stride,
                             dtype=self.dtype, name="conv2")(out)
        else:
            out = _conv(self.planes, 3, self.stride, "conv2", self.dtype)(out)
        out = _bn(train, "bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, 1, "conv3", self.dtype)(out)
        out = _bn(train, "bn3")(out)
        if self.downsample:
            residual = _conv(self.planes * self.expansion, 1, self.stride,
                             "downsample_conv", self.dtype)(x)
            residual = _bn(train, "downsample_bn")(residual)
        return nn.relu(out + residual)


class ResNet(nn.Module):
    """``src/modules/resnet.py:162-242``: stem (7×7/2 conv + BN + relu +
    3×3/2 maxpool) then 4 stages; returns (c2, c3, c4, c5)."""

    block: type
    layers: Sequence[int]
    dcn: bool = False
    dtype: Dtype = jnp.float32
    # per-block conv1 widths (len == sum(layers)), in creation order
    # layer1_0, layer1_1, ..., layer4_N — None entries keep the default.
    # BasicBlock only (Bottleneck pruning not implemented).
    hidden_planes: Sequence[int] | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, kernel_init=he_normal_torch(),
                    dtype=self.dtype, name="conv1")(x)
        x = _bn(train, "bn1")(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        feats = []
        in_planes = 64
        block_idx = 0
        for stage, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            # DCN applies to layer2..layer4 only (src/modules/resnet.py:181-195)
            use_dcn = self.dcn and stage > 0
            for b in range(blocks):
                s = stride if b == 0 else 1
                downsample = (b == 0 and
                              (s != 1 or in_planes != planes *
                               self.block.expansion))
                kwargs = {}
                if (self.hidden_planes is not None
                        and self.block is BasicBlock
                        and self.hidden_planes[block_idx]):
                    kwargs["hidden_planes"] = self.hidden_planes[block_idx]
                x = self.block(planes=planes, stride=s, downsample=downsample,
                               with_dcn=use_dcn, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}", **kwargs)(
                                   x, train=train)
                in_planes = planes * self.block.expansion
                block_idx += 1
            feats.append(x)
        return tuple(feats)  # c2, c3, c4, c5


def resnet18(dtype=jnp.float32, dcn=False):
    """``src/modules/resnet.py:245-255``; out channels [64, 128, 256, 512]."""
    return ResNet(block=BasicBlock, layers=(2, 2, 2, 2), dcn=dcn, dtype=dtype)


def deformable_resnet18(dtype=jnp.float32):
    """``src/modules/resnet.py:258-268``."""
    return resnet18(dtype=dtype, dcn=True)


def resnet34(dtype=jnp.float32, dcn=False):
    """``src/modules/resnet.py:271-281``."""
    return ResNet(block=BasicBlock, layers=(3, 4, 6, 3), dcn=dcn, dtype=dtype)


def resnet50(dtype=jnp.float32, dcn=False):
    """``src/modules/resnet.py:284-292``; out channels ×4."""
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3), dcn=dcn, dtype=dtype)


def deformable_resnet50(dtype=jnp.float32):
    """``src/modules/resnet.py:295-305``."""
    return resnet50(dtype=dtype, dcn=True)


def resnet101(dtype=jnp.float32, dcn=False):
    """``src/modules/resnet.py:308-318``."""
    return ResNet(block=Bottleneck, layers=(3, 4, 23, 3), dcn=dcn, dtype=dtype)


def resnet152(dtype=jnp.float32, dcn=False):
    """``src/modules/resnet.py:321-330``."""
    return ResNet(block=Bottleneck, layers=(3, 8, 36, 3), dcn=dcn, dtype=dtype)


BACKBONE_OUT_CHANNELS = {
    "resnet18": (64, 128, 256, 512),
    "deformable_resnet18": (64, 128, 256, 512),
    "resnet34": (64, 128, 256, 512),
    "resnet50": (256, 512, 1024, 2048),
    "deformable_resnet50": (256, 512, 1024, 2048),
    "resnet101": (256, 512, 1024, 2048),
    "resnet152": (256, 512, 1024, 2048),
}

BACKBONES = {
    "resnet18": resnet18,
    "deformable_resnet18": deformable_resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "deformable_resnet50": deformable_resnet50,
    "resnet101": resnet101,
    "resnet152": resnet152,
}
