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
    # explicit branch width; defaults to in_channels//4. Set by pruned
    # models so that shrinking the neck output does not implicitly shrink
    # the (trained, unpruned) branch convs.
    width: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = self.width or x.shape[-1] // 4
        x = nn.Conv(w, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=self.first_conv_bias,
                    kernel_init=he_normal_torch(), dtype=self.dtype,
                    name="conv1")(x)
        x = _bn_head(train, "bn1")(x)
        x = nn.relu(x)
        x = nn.ConvTranspose(w, (2, 2), strides=(2, 2),
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
    width: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        shrink_maps = _Branch(first_conv_bias=True, dtype=self.dtype,
                              width=self.width, name="binarize")(
                                  x, train=train)
        threshold_maps = _Branch(first_conv_bias=False, dtype=self.dtype,
                                 width=self.width, name="thresh")(
                                     x, train=train)
        if train:
            # step_function (:106-108): differentiable binarization, as the
            # guaranteed-fused Pallas kernel on TPU (analytic VJP); plain
            # σ elsewhere — ops/pallas/db_step.py
            from ..ops.pallas.db_step import db_step

            binary_maps = db_step(shrink_maps, threshold_maps, self.k)
            return jnp.concatenate(
                [shrink_maps, threshold_maps, binary_maps], axis=-1)
        return jnp.concatenate([shrink_maps, threshold_maps], axis=-1)


class FusedDBHead(nn.Module):
    """Inference-optimized DBHead: the two branches' first 3×3 convs
    (256→64 each) run as ONE 256→128 conv, filling the 128-wide MXU that two
    64-channel convs each leave half-empty (~19 % faster head on v5e,
    docs/PERFORMANCE.md). Weight-compatible with ``DBHead`` via
    ``fuse_db_head_params`` — no retraining. Eval mode only."""

    k: float = 50.0
    dtype: Dtype = jnp.float32
    width: int | None = None  # per-branch width; conv1 runs at 2× this

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not train, "FusedDBHead is an inference-only optimization"
        h = nn.Conv((self.width * 2) if self.width else x.shape[-1] // 2,
                    (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=True, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(h)
        h = nn.relu(h)
        half = h.shape[-1] // 2

        def tail(z, name):
            z = nn.ConvTranspose(half, (2, 2), strides=(2, 2),
                                 dtype=self.dtype,
                                 name=f"{name}_deconv1")(z)
            z = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             name=f"{name}_bn2")(z)
            z = nn.relu(z)
            z = nn.ConvTranspose(1, (2, 2), strides=(2, 2),
                                 dtype=self.dtype,
                                 name=f"{name}_deconv2")(z)
            return nn.sigmoid(z.astype(jnp.float32))

        shrink = tail(h[..., :half], "binarize")
        thresh = tail(h[..., half:], "thresh")
        return jnp.concatenate([shrink, thresh], axis=-1)


def fuse_db_head_params(head_params: dict, head_stats: dict):
    """Rewrite a trained ``DBHead`` param/stats subtree into the
    ``FusedDBHead`` structure: conv1 kernels concat along output channels
    (the thresh branch's missing bias becomes zeros), bn1 concat, branch
    tails pass through."""
    import numpy as np

    b, t = head_params["binarize"], head_params["thresh"]
    bs, ts = head_stats["binarize"], head_stats["thresh"]
    width = np.asarray(b["conv1"]["kernel"]).shape[-1]
    params = {
        "conv1": {
            "kernel": np.concatenate(
                [b["conv1"]["kernel"], t["conv1"]["kernel"]], axis=-1),
            "bias": np.concatenate(
                [b["conv1"]["bias"],
                 np.zeros((width,), np.asarray(
                     b["conv1"]["bias"]).dtype)]),
        },
        "bn1": {k: np.concatenate([b["bn1"][k], t["bn1"][k]])
                for k in b["bn1"]},
        "binarize_deconv1": b["deconv1"],
        "binarize_bn2": b["bn2"],
        "binarize_deconv2": b["deconv2"],
        "thresh_deconv1": t["deconv1"],
        "thresh_bn2": t["bn2"],
        "thresh_deconv2": t["deconv2"],
    }
    stats = {
        "bn1": {k: np.concatenate([bs["bn1"][k], ts["bn1"][k]])
                for k in bs["bn1"]},
        "binarize_bn2": bs["bn2"],
        "thresh_bn2": ts["bn2"],
    }
    return params, stats


def fuse_variables(variables: dict) -> dict:
    """Transform full ``DBTextModel`` variables (DBHead) into the
    FusedDBHead layout; backbone/neck subtrees pass through."""
    params = dict(variables["params"])
    stats = dict(variables.get("batch_stats", {}))
    fused_p, fused_s = fuse_db_head_params(params["segmentation_head"],
                                           stats["segmentation_head"])
    params["segmentation_head"] = fused_p
    stats["segmentation_head"] = fused_s
    return {"params": params, "batch_stats": stats}


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


HEADS = {"DBHead": DBHead, "ConvHead": ConvHead,
         "FusedDBHead": FusedDBHead}
