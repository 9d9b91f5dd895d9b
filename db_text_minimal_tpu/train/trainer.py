"""Trainer: jitted SPMD train/eval steps + the epoch loop.

TPU-native rebuild of ``src/train.py`` (call stack SURVEY.md §3.1):
- one jitted train step = forward (train mode, 3 maps) → DB loss → grads →
  Adam update, with the on-device 2×2 confusion histogram replacing the
  reference's per-step D2H ``cal_text_score`` copy (``src/train.py:176-182``);
- gradients are data-parallel over a ``jax.sharding.Mesh``: params
  replicated, batch sharded on the ``data`` axis, XLA inserts the psum
  (replacing the reference's implicit single-device accumulation, §2c);
- per-epoch eval: eval loss (2-channel branch), pixel acc/IoU, box P/R/F
  via postprocess + QuadMetric (``src/train.py:228-299``);
- TensorBoard scalars + image grids with the reference's tag names;
- three-checkpoint policy; warmup-poly per-iteration or reduce-on-plateau
  per-epoch LR (``src/train.py:110-136``).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from .. import losses as L
from ..config import ConfigNode
from ..lr_schedules import ReduceLROnPlateau, warmup_poly_lr
from ..metrics import QuadMetric, RunningScore
from ..models import DBTextModel
from ..parallel import auto_data_mesh, replicate_state, shard_batch
from ..postprocess import DeviceBoxRepresenter, SegDetectorRepresenter
from ..utils import setup_determinism, setup_logger
from .checkpoints import CheckpointPolicy, load_params_any, save_checkpoint


ARRAY_KEYS = ("img", "prob_map", "supervision_mask", "thresh_map",
              "text_area_map")


def array_batch(batch: dict) -> dict:
    """Keep only the jit-compatible array leaves of a loader batch."""
    return {k: batch[k] for k in ARRAY_KEYS if k in batch}


def device_preprocess(batch: dict) -> dict:
    """On-device tail of preprocessing for compact-dtype batches: uint8
    image → float32 − Caffe means (RGB order, the reference quirk), compact
    GT maps → float32, bit-packed binary maps (8 px/byte) unpacked. Float32
    batches (mean already subtracted on host) pass through — all pipelines
    produce identical values (binary maps are exact either way)."""
    from ..utils import CAFFE_MEAN

    img = batch["img"]
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) - jnp.asarray(CAFFE_MEAN, jnp.float32)
    width = img.shape[-2]
    out = {"img": img}

    def unpack_bits(v):
        # np.packbits order: first pixel = MSB
        shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
        bits = (v[..., None] >> shifts) & jnp.uint8(1)
        return bits.reshape(v.shape[:-1] + (v.shape[-1] * 8,))

    for key in ("prob_map", "supervision_mask", "thresh_map",
                "text_area_map"):
        if key in batch:
            v = batch[key]
            if v.dtype == jnp.uint8 and v.shape[-1] * 8 == width:
                v = unpack_bits(v)
            out[key] = v.astype(jnp.float32)
    return out


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def _dcn_offset_mask(params):
    """Pytree of bools marking every leaf under an ``offset_conv`` module
    (the DCN sampling-offset branch, ``models/deform.py``)."""
    def walk(node, inside):
        if isinstance(node, dict):
            return {k: walk(v, inside or k == "offset_conv")
                    for k, v in node.items()}
        return inside

    return walk(params, False)


def make_optimizer(cfg) -> optax.GradientTransformation:
    """torch Adam parity (``src/train.py:114-117``): betas (0.9, 0.999),
    eps 1e-8, optional weight decay (torch Adam's L2-in-gradient form, not
    AdamW) and amsgrad. LR is applied separately per step so host-side
    schedules (reduce-on-plateau) can steer it.

    ``optimizer.dcn_offset_lr_mult`` (default 1.0 = reference parity)
    scales ONLY the deformable-conv offset branch's updates: Adam
    normalizes gradient magnitude away, so zero-init offsets otherwise
    take full-LR steps from the first update, and sampling coordinates
    that wander early destabilize the features under them — the standard
    mitigation is a reduced offset LR."""
    chain = []
    wd = float(cfg.optimizer.weight_decay or 0.0)
    if wd > 0:
        chain.append(optax.add_decayed_weights(wd))
    if cfg.optimizer.amsgrad:
        chain.append(optax.scale_by_amsgrad())
    else:
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    mult = float(getattr(cfg.optimizer, "dcn_offset_lr_mult", 1.0) or 1.0)
    if mult != 1.0:
        chain.append(optax.masked(optax.scale(mult), _dcn_offset_mask))
    return optax.chain(*chain)


def confusion_hist_2x2(pred_prob, gt, mask, thresh: float):
    """On-device 2-class confusion histogram
    (``src/text_metrics.py:63-82`` semantics: both maps multiplied by the
    supervision mask before thresholding/casting)."""
    pred = ((pred_prob * mask) > thresh).astype(jnp.int32)
    gt_i = (gt * mask).astype(jnp.int32)
    hist = jnp.zeros((2, 2), jnp.float32)
    for i in range(2):
        for j in range(2):
            hist = hist.at[i, j].set(
                jnp.sum((gt_i == i) & (pred == j)).astype(jnp.float32))
    return hist


def build_train_step(model: DBTextModel, tx: optax.GradientTransformation,
                     cfg):
    alpha = float(cfg.optimizer.alpha)
    beta = float(cfg.optimizer.beta)
    negative_ratio = float(cfg.optimizer.negative_ratio)
    # optimizer.reduction (the reference's key, example_config.yaml:73):
    # 'mean' reproduces its degenerate OHEM exactly; 'none' = true per-pixel
    reduction = str(cfg.optimizer.reduction or "mean")
    score_thresh = float(cfg.metric.thred_text_score)

    def train_step(state: TrainState, batch: dict, lr: jnp.ndarray):
        batch = device_preprocess(batch)

        def loss_fn(params):
            preds, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["img"], train=True, mutable=["batch_stats"])
            out = L.db_loss(preds, batch["prob_map"],
                            batch["supervision_mask"], batch["thresh_map"],
                            batch["text_area_map"], alpha=alpha, beta=beta,
                            negative_ratio=negative_ratio,
                            reduction=reduction)
            return out.total_loss, (out, mutated["batch_stats"], preds)

        grads, (loss_out, new_stats, preds) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state,
                                           state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        hist = confusion_hist_2x2(preds[..., 0], batch["prob_map"],
                                  batch["supervision_mask"], score_thresh)
        new_state = state.replace(params=new_params, batch_stats=new_stats,
                                  opt_state=new_opt_state,
                                  step=state.step + 1)
        return new_state, loss_out, hist, preds

    return train_step


def build_eval_step(model: DBTextModel, cfg):
    beta = float(cfg.optimizer.beta)
    negative_ratio = float(cfg.optimizer.negative_ratio)
    # optimizer.reduction (the reference's key, example_config.yaml:73):
    # 'mean' reproduces its degenerate OHEM exactly; 'none' = true per-pixel
    reduction = str(cfg.optimizer.reduction or "mean")
    score_thresh = float(cfg.metric.thred_text_score)

    def eval_step(state: TrainState, batch: dict):
        batch = device_preprocess(batch)
        preds = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["img"], train=False)
        loss = L.db_loss_eval(preds, batch["prob_map"],
                              batch["supervision_mask"],
                              batch["thresh_map"], batch["text_area_map"],
                              beta=beta, negative_ratio=negative_ratio,
                              reduction=reduction)
        hist = confusion_hist_2x2(preds[..., 0], batch["prob_map"],
                                  batch["supervision_mask"], score_thresh)
        return preds, loss, hist

    return eval_step


class Trainer:
    """Epoch-loop orchestration (``src/train.py:77-319``)."""

    def __init__(self, cfg: ConfigNode, train_loader=None, test_loader=None,
                 mesh=None, tb_writer=None):
        self.cfg = cfg
        self.logger = setup_logger(
            log_file_path=os.path.join(cfg.meta.root_dir or ".",
                                       cfg.logging.logger_file)
            if cfg.logging and cfg.logging.logger_file else None)
        setup_determinism(int(cfg.trainer.seed if cfg.trainer else 42))

        self.mesh = mesh or auto_data_mesh(
            int(cfg.hps.batch_size),
            cfg.parallel.num_devices if cfg.parallel else None)
        dtype = jnp.bfloat16 if (
            cfg.parallel and cfg.parallel.compute_dtype == "bfloat16"
            and jax.default_backend() == "tpu") else jnp.float32
        from ..models.prune import widths_to_model_kwargs

        self.model = DBTextModel(
            backbone_name=cfg.model.backbone or "resnet18",
            neck_name=cfg.model.neck or "FPN",
            head_name=cfg.model.head or "DBHead",
            dtype=dtype,
            # structured-pruning widths (models/prune.py sidecar), set by
            # quality_bench/cli.train when resuming a pruned checkpoint
            **widths_to_model_kwargs(cfg.model.widths))
        self.tx = make_optimizer(cfg)
        self.train_loader = train_loader
        self.test_loader = test_loader
        self.tb_writer = tb_writer

        self._train_step = jax.jit(build_train_step(self.model, self.tx, cfg),
                                   donate_argnums=(0,))
        self._eval_step = jax.jit(build_eval_step(self.model, cfg))

        # LR schedule (src/train.py:110-136)
        self.base_lr = float(cfg.optimizer.lr)
        if cfg.model.finetune_cp_path:
            self.base_lr = float(cfg.optimizer.lr_finetune)
        self.lrs_mode = cfg.lrs.mode if cfg.lrs else "reduce"
        if self.lrs_mode == "poly":
            # lrs.max_iters=0 reproduces the reference quirk (decay to 0
            # right after warmup, src/train.py:128-129); set it to the
            # planned total steps for a real polynomial decay
            self.poly_schedule = warmup_poly_lr(
                self.base_lr, warmup_iters=int(cfg.lrs.warmup_iters),
                max_iters=int(getattr(cfg.lrs, "max_iters", 0) or 0))
            self.plateau = None
        else:
            self.poly_schedule = None
            self.plateau = ReduceLROnPlateau(factor=float(cfg.lrs.factor),
                                             patience=int(cfg.lrs.patience))
        self.global_step = 0

    # ------------------------------------------------------------------
    def init_state(self, image_size: int | None = None,
                   batch_size: int | None = None) -> TrainState:
        size = image_size or int(self.cfg.hps.img_size)
        bs = batch_size or int(self.cfg.hps.batch_size)
        sample = jnp.zeros((bs, size, size, 3), jnp.float32)
        variables = self.model.init(
            jax.random.PRNGKey(int(self.cfg.trainer.seed or 42)), sample,
            train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        # ImageNet-pretrained backbone warm start, the reference's
        # resnet18(pretrained=True) path (src/modules/resnet.py:245-255)
        pb = self.cfg.model.pretrained_backbone_path
        if pb and os.path.exists(str(pb)):
            from ..utils.torch_port import load_pretrained_backbone

            self.logger.info("Loading pretrained backbone: %s", pb)
            params, batch_stats = load_pretrained_backbone(
                str(pb), params, batch_stats)
        # finetune warm start (src/train.py:100-107)
        ft = self.cfg.model.finetune_cp_path
        if ft and os.path.exists(os.path.join(self.cfg.meta.root_dir or ".",
                                              str(ft))):
            path = os.path.join(self.cfg.meta.root_dir or ".", str(ft))
            self.logger.info("Loading finetune checkpoint: %s", path)
            try:
                loaded = load_params_any(
                    path, {"params": params, "batch_stats": batch_stats,
                           "opt_state": self.tx.init(params),
                           "step": jnp.zeros((), jnp.int32)})
            except ValueError:
                # params-only checkpoint (e.g. cli.prune output) — same
                # fallback as resume_state
                loaded = load_params_any(
                    path, {"params": params, "batch_stats": batch_stats})
            params = loaded["params"]
            batch_stats = loaded["batch_stats"]
        state = TrainState(params=params, batch_stats=batch_stats,
                           opt_state=self.tx.init(params),
                           step=jnp.zeros((), jnp.int32))
        return replicate_state(state, self.mesh)

    def resume_state(self, checkpoint_path: str,
                     image_size: int | None = None,
                     batch_size: int | None = None) -> TrainState:
        """Restore FULL training state (params + batch stats + optimizer
        moments + step) — true resume, which the reference could not do
        (it saved only model weights, SURVEY.md §5 checkpoint note)."""
        from .checkpoints import restore_checkpoint

        template = jax.device_get(self.init_state(image_size, batch_size))
        try:
            restored = restore_checkpoint(
                checkpoint_path,
                {"params": template.params,
                 "batch_stats": template.batch_stats,
                 "opt_state": template.opt_state, "step": template.step})
        except ValueError:
            # params-only checkpoint (e.g. cli.prune output): restore the
            # model and start the optimizer fresh — stale moments would be
            # wrong for pruned/rewritten weights anyway
            restored = restore_checkpoint(
                checkpoint_path,
                {"params": template.params,
                 "batch_stats": template.batch_stats})
            restored["opt_state"] = self.tx.init(restored["params"])
            restored["step"] = jnp.zeros((), jnp.int32)
        state = TrainState(**restored)
        self.global_step = int(state.step)
        return replicate_state(state, self.mesh)

    def current_lr(self) -> float:
        if self.lrs_mode == "poly":
            return float(self.poly_schedule(self.global_step))
        return self.base_lr * self.plateau.scale

    # ------------------------------------------------------------------
    def train_epoch(self, state: TrainState, epoch: int):
        from ..utils.profiling import StepTimer

        cfg = self.cfg
        running = RunningScore(int(cfg.hps.no_classes))
        timer = StepTimer(warmup=1)
        train_loss = 0.0
        n_batches = 0
        last = (None, None)
        # Metrics stay on device between log points: materializing them
        # per-step (float()/np.asarray) inserts a host sync after every step
        # and stalls the dispatch pipeline. The reference logged every step
        # (src/train.py:188-201); here scalars flush every log_iter steps.
        log_iter = int(cfg.hps.log_iter)
        loss_sum = jnp.float32(0)
        hist_sum = jnp.zeros((2, 2), jnp.float32)
        pending: list = []   # (global_step, lr, loss_out) awaiting flush

        def flush(final: bool = False):
            nonlocal pending
            for gs, lr_v, lo in pending:
                if self.tb_writer is not None:
                    w = self.tb_writer
                    w.add_scalar("TRAIN/LOSS/total_loss",
                                 float(lo.total_loss), gs)
                    w.add_scalar("TRAIN/LOSS/loss",
                                 float(lo.prob_threshold_loss), gs)
                    w.add_scalar("TRAIN/LOSS/prob_loss",
                                 float(lo.prob_loss), gs)
                    w.add_scalar("TRAIN/LOSS/threshold_loss",
                                 float(lo.threshold_loss), gs)
                    w.add_scalar("TRAIN/LOSS/binary_loss",
                                 float(lo.binary_loss), gs)
                    w.add_scalar("TRAIN/HPs/lr", lr_v, gs)
            if pending:
                gs, lr_v, lo = pending[-1]
                running.confusion_matrix = np.asarray(hist_sum,
                                                      dtype=np.float64)
                scores, _ = running.get_scores()
                if self.tb_writer is not None:
                    self.tb_writer.add_scalar("TRAIN/ACC_IOU/acc",
                                              scores["Mean Acc"], gs)
                    self.tb_writer.add_scalar(
                        "TRAIN/ACC_IOU/iou_shrink_map", scores["Mean IoU"],
                        gs)
                if not final:
                    self.logger.info(
                        "[%d-%d] - lr: %g - total_loss: %.5f - loss: %.5f "
                        "- acc: %.4f - iou: %.4f", epoch + 1, gs, lr_v,
                        float(lo.total_loss),
                        float(lo.prob_threshold_loss),
                        scores["Mean Acc"], scores["Mean IoU"])
            pending = []

        for batch in self.train_loader:
            lr = self.current_lr()
            self.global_step += 1
            n_batches += 1
            device_batch = shard_batch(array_batch(batch), self.mesh)
            state, loss_out, hist, preds = self._train_step(
                state, device_batch, jnp.float32(lr))
            loss_sum = loss_sum + loss_out.total_loss   # device-side
            hist_sum = hist_sum + hist
            timer.tick(batch["img"].shape[0])
            last = (batch, preds)
            pending.append((self.global_step, lr, loss_out))
            if self.global_step % log_iter == 0:
                flush()
        flush(final=True)
        train_loss = float(loss_sum)
        ips = timer.images_per_sec
        if ips > 0:
            # images/sec/chip: the BASELINE metric, reported per epoch
            per_chip = ips / max(self.mesh.devices.size, 1)
            self.logger.info("throughput: %.1f img/s (%.1f img/s/chip)",
                             ips, per_chip)
            if self.tb_writer is not None:
                self.tb_writer.add_scalar("TRAIN/HPs/images_per_sec", ips,
                                          self.global_step)
        mean_loss = train_loss / max(n_batches, 1)
        # the tunneled TPU client retains per-step upload buffers until a
        # collection runs (~35 MB/step — a 40-epoch run OOM-killed a
        # 128 GB host); a per-epoch sweep keeps RSS flat
        import gc

        gc.collect()
        return state, mean_loss, running, last

    # ------------------------------------------------------------------
    def eval_epoch(self, state: TrainState):
        cfg = self.cfg
        is_poly = bool(cfg.metric.is_output_polygon)
        # rect mode with metric.device_boxes=True uses the on-device box
        # extractor (threshold + CC + oriented rects under jit; K records
        # D2H instead of full maps); polygon mode takes the host parity
        # path. Inside a training process this additionally requires
        # device_boxes_in_train (default True since the round-5
        # diag_inproc probe measured bitwise A/B parity after 1000
        # in-process steps; docs/PERFORMANCE.md RESOLVED note — set it
        # False to force the host representer if the 2026-08-17 deficit
        # class is ever suspected again).
        use_device_boxes = (not is_poly
                            and bool(cfg.metric.device_boxes)
                            and bool(getattr(cfg.metric,
                                             "device_boxes_in_train",
                                             False)))
        rep_cls = DeviceBoxRepresenter if use_device_boxes \
            else SegDetectorRepresenter
        seg_obj = rep_cls(
            thresh=float(cfg.metric.thred_text_score),
            box_thresh=float(cfg.metric.prob_threshold),
            unclip_ratio=float(cfg.metric.unclip_ratio))
        metric_cls = QuadMetric()
        running = RunningScore(int(cfg.hps.no_classes))
        raw_metrics = []
        n = 0
        size = int(cfg.hps.img_size)
        # losses/histograms accumulate ON DEVICE; one readback at the end
        # (the train loop's lazy-flush treatment — a per-batch float() would
        # serialize device and host work)
        loss_sum = jnp.float32(0)
        hist_sum = jnp.zeros((2, 2), jnp.float32)
        # one random test batch gets TB image grids (src/train.py:249-257)
        visualize_index = (np.random.randint(len(self.test_loader))
                           if self.tb_writer is not None
                           and len(self.test_loader) else -1)

        def finish(pending):
            """Host postprocess of an already-dispatched batch — runs while
            the device computes the NEXT batch (double-buffer overlap)."""
            batch, preds = pending
            batch_shape = {"shape": [(size, size)] * preds.shape[0]}
            box_list, score_list = seg_obj(batch_shape, preds,
                                           is_output_polygon=is_poly)
            raw_metrics.append(metric_cls.validate_measure(
                batch, (box_list, score_list)))

        pending = None
        for batch in self.test_loader:
            device_batch = shard_batch(array_batch(batch), self.mesh)
            preds, loss, hist = self._eval_step(state, device_batch)
            loss_sum = loss_sum + loss
            hist_sum = hist_sum + hist
            if n == visualize_index:
                from ..utils.visualize import visualize_tfb

                visualize_tfb(self.tb_writer, batch["img"],
                              np.asarray(preds), self.global_step,
                              thresh=float(cfg.metric.thred_text_score),
                              mode="TEST")
            n += 1
            # both representers accept device arrays; conversion (the D2H
            # sync) happens inside finish(), overlapped with the next step
            next_pending = (batch, preds)
            if pending is not None:
                finish(pending)
            pending = next_pending
        if pending is not None:
            finish(pending)
        running.confusion_matrix += np.asarray(hist_sum, dtype=np.float64)
        metrics = metric_cls.gather_measure(raw_metrics)
        test_loss = float(loss_sum) / max(n, 1)
        return (test_loss, running, metrics["recall"].avg,
                metrics["precision"].avg, metrics["fmeasure"].avg)

    # ------------------------------------------------------------------
    def fit(self, state: TrainState | None = None,
            no_epochs: int | None = None):
        cfg = self.cfg
        state = state if state is not None else self.init_state()
        epochs = no_epochs if no_epochs is not None else int(
            cfg.hps.no_epochs)
        policy = CheckpointPolicy(cfg.meta.root_dir or ".",
                                  cfg.model.best_cp_path,
                                  cfg.model.last_cp_path,
                                  cfg.model.best_hmean_cp_path,
                                  widths=cfg.model.widths)
        history = []
        for epoch in range(epochs):
            state, train_loss, _, last = self.train_epoch(state, epoch)
            self.logger.info("Train loss: %.5f", train_loss)
            if self.tb_writer is not None and last[0] is not None:
                # per-epoch image grids (src/train.py:215-220)
                from ..utils.visualize import visualize_tfb

                visualize_tfb(self.tb_writer, last[0]["img"],
                              np.asarray(last[1]), self.global_step,
                              thresh=float(cfg.metric.thred_text_score),
                              mode="TRAIN")
            test_loss, _, recall, precision, hmean = self.eval_epoch(state)
            self.logger.info(
                "TEST/Recall: %.4f - TEST/Precision: %.4f - TEST/HMean: %.4f",
                recall, precision, hmean)
            self.logger.info("[%d] - test_loss: %.5f", self.global_step,
                             test_loss)
            if self.tb_writer is not None:
                gs = self.global_step
                self.tb_writer.add_scalar("TEST/LOSS/val_loss", test_loss, gs)
                self.tb_writer.add_scalar("TEST/recall", recall, gs)
                self.tb_writer.add_scalar("TEST/precision", precision, gs)
                self.tb_writer.add_scalar("TEST/hmean", hmean, gs)
            host_state = jax.device_get(state)
            policy.on_epoch_end(
                {"params": host_state.params,
                 "batch_stats": host_state.batch_stats,
                 "opt_state": host_state.opt_state,
                 "step": host_state.step},
                train_loss=train_loss, test_loss=test_loss, hmean=hmean,
                epoch=epoch)
            if self.lrs_mode == "reduce":
                self.plateau.step(test_loss)       # src/train.py:310-311
            history.append({"epoch": epoch, "train_loss": train_loss,
                            "test_loss": test_loss, "hmean": hmean})
        host_state = jax.device_get(state)
        policy.on_train_end(
            {"params": host_state.params,
             "batch_stats": host_state.batch_stats,
             "opt_state": host_state.opt_state, "step": host_state.step},
            epochs)
        self.logger.info("Training completed")
        return state, history
