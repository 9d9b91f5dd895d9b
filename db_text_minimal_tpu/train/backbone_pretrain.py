"""In-tree backbone pretraining (pretext task) + torchvision ``.pth`` export.

The reference warm-starts its backbone from torchvision's ImageNet resnet18
(``src/modules/resnet.py:245-255``, loaded ``strict=False``). No ImageNet
weights exist in this environment, so this module produces the strongest
available stand-in: it pretrains the SAME Flax ResNet backbone on a
text/no-text patch-classification pretext task over synthetic scenes, then
exports the weights as a torchvision-format ``.pth`` via
``utils.torch_port.save_backbone_pth`` — so detector training consumes them
through the exact ``model.pretrained_backbone_path`` import path real
ImageNet/``db_resnet18.pth`` weights would use (docs/QUALITY_PARITY.md).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ..models.resnet import BACKBONES


class BackboneClassifier(nn.Module):
    """Backbone → global-average-pooled c5 → linear logits. The backbone
    submodule is named ``backbone`` so its params subtree matches
    ``DBTextModel`` exactly."""

    backbone_name: str = "resnet18"
    num_classes: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        template = BACKBONES[self.backbone_name]()
        backbone = type(template)(
            **{f.name: getattr(template, f.name)
               for f in template.__dataclass_fields__.values()
               if f.name not in ("name", "parent")}, name="backbone")
        c2, c3, c4, c5 = backbone(x, train=train)
        h = jnp.mean(c5, axis=(1, 2))
        return nn.Dense(self.num_classes, name="fc")(h)


class BackboneDense(nn.Module):
    """Backbone → c3 (stride 8) → 1×1 conv → per-cell text logit. The DENSE
    pretext (predict the text layout, not just its presence) teaches the
    backbone localization-relevant features; the binary patch classifier it
    replaces saturated early and its warm start measured WORSE than scratch
    (round-2 metrics_warm.json, VERDICT r2 ask #8)."""

    backbone_name: str = "resnet18"

    @nn.compact
    def __call__(self, x, train: bool = False):
        template = BACKBONES[self.backbone_name]()
        backbone = type(template)(
            **{f.name: getattr(template, f.name)
               for f in template.__dataclass_fields__.values()
               if f.name not in ("name", "parent")}, name="backbone")
        c2, c3, c4, c5 = backbone(x, train=train)
        # fuse stride-16 context into the stride-8 map (1x1 convs only; the
        # detector re-learns its real neck from scratch)
        up4 = jax.image.resize(c4, c3.shape[:1] + c3.shape[1:3]
                               + c4.shape[3:], method="nearest")
        h = jnp.concatenate([c3, up4], axis=-1)
        return nn.Conv(1, (1, 1), name="cell_head")(h)[..., 0]


def sample_patches_dense(images: list, bboxes: list,
                         rng: np.random.RandomState, n: int,
                         patch: int = 128, cell: int = 8):
    """Random crops + per-cell text-coverage labels at stride ``cell``:
    label[cy, cx] = 1 where word bboxes cover >35 % of the cell, 0 where
    <5 %, else masked out (weight 0)."""
    g = patch // cell
    xs = np.empty((n, patch, patch, 3), np.float32)
    ys = np.zeros((n, g, g), np.float32)
    ws = np.zeros((n, g, g), np.float32)
    for count in range(n):
        i = rng.randint(len(images))
        img = images[i]
        H, W = img.shape[:2]
        x0 = rng.randint(0, W - patch)
        y0 = rng.randint(0, H - patch)
        cover = np.zeros((patch, patch), np.float32)
        for bx0, by0, bx1, by1 in bboxes[i]:
            ix0 = int(np.clip(bx0 - x0, 0, patch))
            ix1 = int(np.clip(bx1 - x0, 0, patch))
            iy0 = int(np.clip(by0 - y0, 0, patch))
            iy1 = int(np.clip(by1 - y0, 0, patch))
            cover[iy0:iy1, ix0:ix1] = 1.0
        frac = cover.reshape(g, cell, g, cell).mean(axis=(1, 3))
        ys[count] = (frac > 0.35).astype(np.float32)
        ws[count] = ((frac > 0.35) | (frac < 0.05)).astype(np.float32)
        xs[count] = img[y0:y0 + patch, x0:x0 + patch].astype(np.float32)
    from ..utils import CAFFE_MEAN

    return xs - np.asarray(CAFFE_MEAN, np.float32), ys, ws


def pretrain_backbone_dense(train_dir: str, gt_dir: str, out_path: str,
                            backbone: str = "resnet18", steps: int = 1000,
                            batch_size: int = 64, lr: float = 2e-3,
                            seed: int = 0, limit_images: int | None = 512,
                            log=print) -> dict:
    """Dense-pretext pretraining (text-layout prediction at stride 8) +
    torchvision-format ``.pth`` export. Cosine LR decay; class-balanced BCE
    (text cells are rare)."""
    rng = np.random.RandomState(seed)
    images, bboxes = load_scene_bboxes(train_dir, gt_dir, limit_images)
    model = BackboneDense(backbone_name=backbone)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    schedule = optax.cosine_decay_schedule(lr, steps)
    tx = optax.adam(schedule)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y, w):
        def loss_fn(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"])
            # balance positive/negative cells
            pos = (y * w).sum() + 1.0
            neg = ((1 - y) * w).sum() + 1.0
            cw = w * (y * (0.5 / pos) + (1 - y) * (0.5 / neg))
            bce = optax.sigmoid_binary_cross_entropy(logits, y)
            loss = (bce * cw).sum()
            acc = ((((logits > 0) == (y > 0.5)) * w).sum()
                   / jnp.maximum(w.sum(), 1.0))
            return loss, (mutated["batch_stats"], acc)

        grads, (new_stats, acc) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, acc

    acc = 0.0
    for step in range(steps):
        x, y, w = sample_patches_dense(images, bboxes, rng, batch_size)
        params, batch_stats, opt_state, acc = train_step(
            params, batch_stats, opt_state, jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(w))
        if (step + 1) % 50 == 0:
            log(f"dense pretrain step {step + 1}/{steps} "
                f"cell_acc={float(acc):.3f}")

    from ..utils.torch_port import save_backbone_pth

    params = jax.device_get(params)
    batch_stats = jax.device_get(batch_stats)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    save_backbone_pth(out_path, params["backbone"],
                      batch_stats["backbone"])
    return {"cell_accuracy": float(acc), "steps": steps, "path": out_path}


def sample_patches(images: list, bboxes: list, rng: np.random.RandomState,
                   n: int, patch: int = 128):
    """Random crops labeled text(1)/no-text(0) by word-bbox coverage of the
    crop. ``bboxes``: per-image (K, 4) arrays of [x0, y0, x1, y1]."""
    xs = np.empty((n, patch, patch, 3), np.float32)
    ys = np.empty((n,), np.int32)
    count = 0
    while count < n:
        i = rng.randint(len(images))
        img = images[i]
        H, W = img.shape[:2]
        x0 = rng.randint(0, W - patch)
        y0 = rng.randint(0, H - patch)
        cover = 0.0
        for bx0, by0, bx1, by1 in bboxes[i]:
            iw = min(bx1, x0 + patch) - max(bx0, x0)
            ih = min(by1, y0 + patch) - max(by0, y0)
            if iw > 0 and ih > 0:
                cover += iw * ih
        frac = cover / (patch * patch)
        label = 1 if frac > 0.08 else (0 if frac < 0.01 else -1)
        if label < 0:      # ambiguous crop: resample
            continue
        if label != count % 2:   # alternate classes: balanced batches
            continue
        xs[count] = img[y0:y0 + patch, x0:x0 + patch].astype(np.float32)
        ys[count] = label
        count += 1
    from ..utils import CAFFE_MEAN

    return xs - np.asarray(CAFFE_MEAN, np.float32), ys


def load_scene_bboxes(train_dir: str, gt_dir: str, limit: int | None = None):
    """Scene images + word bboxes from a TotalText-format dataset."""
    import cv2

    from ..data.parsers import load_totaltext

    fps, anns = load_totaltext(train_dir, gt_dir)
    if limit:
        fps, anns = fps[:limit], anns[:limit]
    images, bboxes = [], []
    for fp, ann in zip(fps, anns):
        img = cv2.imread(fp)[:, :, ::-1]
        images.append(np.ascontiguousarray(img))
        bb = []
        for item in ann:
            poly = np.asarray(item["poly"], np.float64)
            bb.append([poly[:, 0].min(), poly[:, 1].min(),
                       poly[:, 0].max(), poly[:, 1].max()])
        bboxes.append(np.asarray(bb) if bb else np.zeros((0, 4)))
    return images, bboxes


def pretrain_backbone(train_dir: str, gt_dir: str, out_path: str,
                      backbone: str = "resnet18", steps: int = 300,
                      batch_size: int = 64, lr: float = 1e-3,
                      seed: int = 0, limit_images: int | None = 256,
                      log=print) -> dict:
    """Train the pretext classifier and write the torchvision-format
    ``.pth``. Returns {'accuracy': float, 'steps': int, 'path': str}."""
    rng = np.random.RandomState(seed)
    images, bboxes = load_scene_bboxes(train_dir, gt_dir, limit_images)
    model = BackboneClassifier(backbone_name=backbone)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, 128, 128, 3)), train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, x, y):
        def loss_fn(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats}, x, train=True,
                mutable=["batch_stats"])
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            acc = (logits.argmax(-1) == y).mean()
            return loss, (mutated["batch_stats"], acc)

        grads, (new_stats, acc) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, acc

    acc = 0.0
    for step in range(steps):
        x, y = sample_patches(images, bboxes, rng, batch_size)
        params, batch_stats, opt_state, acc = train_step(
            params, batch_stats, opt_state, jnp.asarray(x), jnp.asarray(y))
        if (step + 1) % 50 == 0:
            log(f"pretrain step {step + 1}/{steps} acc={float(acc):.3f}")

    from ..utils.torch_port import save_backbone_pth

    params = jax.device_get(params)
    batch_stats = jax.device_get(batch_stats)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    save_backbone_pth(out_path, params["backbone"],
                      batch_stats["backbone"])
    return {"accuracy": float(acc), "steps": steps, "path": out_path}
