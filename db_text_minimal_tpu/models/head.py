"""DB segmentation head in Flax.

TPU-native rebuild of ``src/modules/segmentation_head.py``: ``DBHead`` (:20)
with the ``binarize`` branch (:24-29), ``thresh`` branch (:55-79) and the
training-only differentiable binarization ``B̂ = 1/(1+exp(-k(P-T)))``
(:106-108, k=50); plus the unused-but-present ``ConvHead`` (:8-17).

Branch structure (each): conv3×3(C→C/4) + BN + relu → deconv2×2/2 + BN +
relu → deconv2×2/2 → sigmoid, i.e. 4× upsampling back to input resolution
when fed stride-4 FPN features. Torch bias defaults are preserved:
binarize branch convs have bias, thresh first conv has ``bias=False``
(:66-69) while its ConvTranspose layers keep default bias (:104).

Init parity: Kaiming-normal convs, BN γ=1 β=1e-4 (:47-53).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import Dtype, he_normal_torch


def _bn_head(train: bool, name: str):
    # weights_init: BN weight 1, bias 1e-4 (segmentation_head.py:50-53)
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32,
                        bias_init=nn.initializers.constant(1e-4), name=name)


class _Branch(nn.Module):
    first_conv_bias: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = nn.Conv(c // 4, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=self.first_conv_bias,
                    kernel_init=he_normal_torch(), dtype=self.dtype,
                    name="conv1")(x)
        x = _bn_head(train, "bn1")(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2),
                             kernel_init=he_normal_torch(), dtype=self.dtype,
                             name="deconv1")(x)
        x = _bn_head(train, "bn2")(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(1, (2, 2), strides=(2, 2),
                             kernel_init=he_normal_torch(), dtype=self.dtype,
                             name="deconv2")(x)
        return nn.sigmoid(x.astype(jnp.float32))


class DBHead(nn.Module):
    """``src/modules/segmentation_head.py:20-108``. Returns NHWC with
    3 channels (P, T, B̂) in train mode, 2 channels (P, T) in eval mode."""

    k: float = 50.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        shrink_maps = _Branch(first_conv_bias=True, dtype=self.dtype,
                              name="binarize")(x, train=train)
        threshold_maps = _Branch(first_conv_bias=False, dtype=self.dtype,
                                 name="thresh")(x, train=train)
        if train:
            # step_function (:106-108): differentiable binarization
            binary_maps = nn.sigmoid(self.k * (shrink_maps - threshold_maps))
            return jnp.concatenate(
                [shrink_maps, threshold_maps, binary_maps], axis=-1)
        return jnp.concatenate([shrink_maps, threshold_maps], axis=-1)


class ConvHead(nn.Module):
    """``src/modules/segmentation_head.py:8-17`` (1×1 conv + sigmoid)."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels, (1, 1),
                    kernel_init=he_normal_torch(), dtype=self.dtype,
                    name="conv")(x)
        return nn.sigmoid(x.astype(jnp.float32))


HEADS = {"DBHead": DBHead, "ConvHead": ConvHead}
