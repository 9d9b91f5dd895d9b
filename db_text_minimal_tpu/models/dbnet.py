"""Top-level DBNet detector: backbone → neck → head → full-res output.

TPU-native rebuild of ``src/models.py``: ``DBTextModel`` (:13-48) with the
registry dicts (:8-10) generalized to every implemented backbone/neck/head.
The head output is bilinearly upsampled to the input H×W with
``align_corners=True`` (:43-46) — a no-op at the standard 640×640 training
resolution where head output already equals input resolution.

Train mode → (N, H, W, 3): prob map, threshold map, approx binary map.
Eval mode  → (N, H, W, 2): prob map, threshold map.
(The reference returns NCHW; this framework is NHWC throughout.)
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from .layers import Dtype, resize_bilinear_align_corners
from .resnet import BACKBONES
from .fpn import NECKS
from .head import HEADS


class DBTextModel(nn.Module):
    """backbone_name/neck/head registry mirror of ``src/models.py:8-10``
    (only resnet18+FPN+DBHead is registered there; all variants here)."""

    backbone_name: str = "resnet18"
    neck_name: str = "FPN"
    head_name: str = "DBHead"
    inner_channels: int = 256
    dtype: Dtype = jnp.float32
    # structured-pruning width overrides (models/prune.py); every field
    # None = the unpruned architecture. backbone_hidden is a per-block
    # tuple of conv1 widths; head_width pins the branch width so a pruned
    # neck output does not implicitly shrink the head.
    backbone_hidden: tuple | None = None
    fpn_inner_quarter: int | None = None
    fpn_out: int | None = None
    head_width: int | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1:3]
        x = x.astype(self.dtype)
        template = BACKBONES[self.backbone_name](dtype=self.dtype)
        fields = {f.name: getattr(template, f.name)
                  for f in template.__dataclass_fields__.values()
                  if f.name not in ("name", "parent")}
        if self.backbone_hidden is not None:
            fields["hidden_planes"] = self.backbone_hidden
        backbone = type(template)(**fields, name="backbone")
        neck_cls = NECKS[self.neck_name]
        if self.neck_name == "FPN":
            neck = neck_cls(inner_channels=self.inner_channels,
                            inner_quarter=self.fpn_inner_quarter,
                            out_features=self.fpn_out,
                            dtype=self.dtype, name="segmentation_body")
        else:
            neck = neck_cls(dtype=self.dtype, name="segmentation_body")
        head_kwargs = {}
        if self.head_name in ("DBHead", "FusedDBHead") \
                and self.head_width is not None:
            head_kwargs["width"] = self.head_width
        head = HEADS[self.head_name](dtype=self.dtype, **head_kwargs,
                                     name="segmentation_head")

        feats = backbone(x, train=train)
        body = neck(feats, train=train)
        y = head(body, train=train)
        y = resize_bilinear_align_corners(y.astype(jnp.float32), (h, w))
        return y
