"""Quality-parity benchmark driver: train on a dataset, evaluate with both
postprocess paths (host rect / on-device rect) and both protocols
(IoU-Pascal, DetEval), write one metrics JSON.

The proxy for the reference's published DetEval table (``README.md:88-91``)
until real datasets/checkpoints are on disk — see docs/QUALITY_PARITY.md for
the one-command recipe that swaps in TotalText + ``db_resnet18.pth``.

Usage::

    python -m db_text_minimal_tpu.cli.quality_bench \
        --data_dir tmp/hard_bench --out demo/hard_bench/metrics_scratch.json \
        --epochs 12 [--pretrained_backbone models/backbone_pretext.pth]
        [--backbone resnet18] [--neck FPN] [--reduction mean]
        [--eval_only --checkpoint models/x.ckpt]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

import jax

from ..config import load_config
from ..data import DataLoader, build_dataset
from ..metrics import QuadMetric
from ..metrics.deteval import DetectionDetEvalEvaluator
from ..metrics.iou import DetectionIoUEvaluator
from ..models.prune import load_widths
from ..postprocess import (DeviceBoxRepresenter, DevicePolyRepresenter,
                           SegDetectorRepresenter)
from ..train import Trainer
from ..train.trainer import array_batch
from ..parallel import shard_batch


def load_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, required=True,
                        help="TotalText-format dataset root "
                             "(train_images/ train_gts/ test_images/ "
                             "test_gts/)")
    parser.add_argument("--out", type=str, required=True,
                        help="metrics JSON path")
    parser.add_argument("--epochs", type=int, default=12)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--test_batch_size", type=int, default=16)
    parser.add_argument("--lr", type=float, default=0.005)
    parser.add_argument("--backbone", type=str, default="resnet18")
    parser.add_argument("--neck", type=str, default="FPN")
    parser.add_argument("--reduction", type=str, default="mean",
                        choices=("mean", "none"))
    parser.add_argument("--lrs", type=str, default="reduce",
                        choices=("reduce", "poly"),
                        help="poly = warmup + polynomial decay over the "
                             "full training horizon (the reference's "
                             "intended schedule, with a real max_iters)")
    parser.add_argument("--lrs_max_iters", type=int, default=0,
                        help="override the poly decay horizon in steps — "
                             "set to the FULL horizon when chunking a long "
                             "run into resumable segments (the tunneled "
                             "TPU client retains ~35 MB per step of upload "
                             "buffers, so 128 GB of host RAM caps one "
                             "process at ~3500 steps)")
    parser.add_argument("--no_final_eval", action="store_true",
                        help="skip the end-of-run eval (intermediate "
                             "segments of a chunked run)")
    parser.add_argument("--pretrained_backbone", type=str, default=None)
    parser.add_argument("--dcn_offset_lr_mult", type=float, default=1.0,
                        help="deformable backbones: LR multiplier for the "
                             "DCN offset branch (1.0 = reference parity)")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="warm start / eval_only weights")
    parser.add_argument("--eval_only", action="store_true")
    parser.add_argument("--limit_train", type=int, default=None)
    parser.add_argument("--limit_test", type=int, default=None)
    parser.add_argument("--eval_every", type=int, default=0,
                        help="run the in-loop eval every N epochs "
                             "(0 = only at the end; keeps long runs fast)")
    # reference canonical eval constants (Makefile:26-28)
    parser.add_argument("--thresh", type=float, default=0.25)
    parser.add_argument("--box_thresh", type=float, default=0.50)
    parser.add_argument("--unclip_ratio", type=float, default=None,
                        help="default 1.5 (reference src/postprocess.py:34);"
                             " --line_level defaults it to 2.5 instead")
    parser.add_argument("--line_level", action="store_true",
                        help="line-level polygon preset (CTW1500 protocol):"
                             " implies --polygon and, unless --unclip_ratio"
                             " is given, the measured line-level operating"
                             " point 2.5 (docs/PERFORMANCE.md §CTW)")
    parser.add_argument("--save_checkpoint", type=str, default=None)
    parser.add_argument("--img_size", type=int, default=640)
    parser.add_argument("--quant", action="store_true",
                        help="evaluate the int8 PTQ inference path "
                             "(BN-folded, selective quantization) instead "
                             "of the float model")
    parser.add_argument("--quant_head", action="store_true",
                        help="with --quant: also quantize the fused head's "
                             "256->128 conv (fastest measured config)")
    parser.add_argument("--dataset_format", type=str, default="totaltext",
                        choices=("totaltext", "ctw1500"),
                        help="gt format of --data_dir; ctw1500 = the "
                             "line-level polygon benchmark "
                             "(make_synthetic --ctw)")
    parser.add_argument("--polygon", action="store_true",
                        help="ALSO evaluate polygon-mode postprocess "
                             "(polygons_from_bitmap, "
                             "src/postprocess.py:54-104) — the reference's "
                             "CTW1500 line-level protocol (README.md:91)")
    parser.add_argument("--dump_eval_dir", type=str, default=None,
                        help="debug: save per-batch preds (f32) + each "
                             "representer's box outputs during full_eval "
                             "so a live divergence can be replayed "
                             "offline bit-exactly")
    args = parser.parse_args(argv)
    if args.line_level:
        args.polygon = True
    if args.unclip_ratio is None:
        args.unclip_ratio = 2.5 if args.line_level else 1.5
    return args


def _limit(dataset, n):
    if n:
        dataset.image_paths = dataset.image_paths[:n]
        dataset.all_anns = dataset.all_anns[:n]
    return dataset


def build_cfg(args):
    fmt = getattr(args, "dataset_format", "totaltext")
    section = {
        "train_dir": os.path.join(args.data_dir, "train_images"),
        "train_gt_dir": os.path.join(args.data_dir, "train_gts"),
        "test_dir": os.path.join(args.data_dir, "test_images"),
        "test_gt_dir": os.path.join(args.data_dir, "test_gts"),
        "ignore_tags": ["###"],
    }
    overrides = {
        "dataset": {"name": fmt},
        "data": {fmt: section},
        "hps": {"batch_size": args.batch_size,
                "test_batch_size": args.test_batch_size,
                "no_epochs": args.epochs, "img_size": args.img_size,
                "log_iter": 25},
        "metric": {"thred_text_score": args.thresh,
                   "prob_threshold": args.box_thresh,
                   "unclip_ratio": args.unclip_ratio,
                   "is_output_polygon": False},
        "model": {"backbone": args.backbone, "neck": args.neck,
                  "head": "DBHead",
                  "pretrained_backbone_path": args.pretrained_backbone or "",
                  "finetune_cp_path": "",
                  # pruned checkpoints carry a widths sidecar
                  # (models/prune.py); apply it so eval/fine-tune builds
                  # the matching narrow architecture
                  "widths": (load_widths(args.checkpoint)
                             if args.checkpoint else None)},
        "optimizer": {"lr": args.lr, "reduction": args.reduction,
                      "dcn_offset_lr_mult": args.dcn_offset_lr_mult},
        "lrs": ({"mode": "poly", "warmup_iters": 100,
                 # decay over the planned training horizon
                 "max_iters": args.lrs_max_iters or args.epochs * max(
                     (args.limit_train or 1600) // args.batch_size, 1)}
                if args.lrs == "poly"
                else {"mode": "reduce", "factor": 0.2, "patience": 4}),
    }
    return load_config("/nonexistent-use-defaults", overrides)


def make_quant_forward(trainer, state, test_loader, args):
    """Build a jitted int8-PTQ forward from the trained state, calibrated
    on the first test batch."""
    import jax.numpy as jnp

    from ..models.head import fuse_variables
    from ..models.quant_infer import (DEFAULT_SKIP,
                                      calibrate_activation_scales,
                                      prepare_quant_params,
                                      quant_dbnet_forward)
    from ..train.trainer import device_preprocess
    from ..utils import CAFFE_MEAN

    host_state = jax.device_get(state)
    qv = prepare_quant_params(
        fuse_variables({"params": host_state.params,
                        "batch_stats": host_state.batch_stats}),
        skip=() if args.quant_head else DEFAULT_SKIP)
    first = next(iter(test_loader))
    cal_img = first["img"].astype(np.float32)
    if first["img"].dtype == np.uint8:
        cal_img = cal_img - np.asarray(CAFFE_MEAN, np.float32)
    qv = calibrate_activation_scales(qv, [cal_img[:2]])
    qv = jax.device_put(qv)
    fwd = jax.jit(quant_dbnet_forward)

    def forward(device_batch):
        return fwd(qv, device_preprocess(device_batch)["img"])

    return forward


def full_eval(trainer, state, test_loader, args, forward=None):
    """Forward the whole test set once; evaluate host vs device postprocess
    under IoU-Pascal (canonical 0.4/0.8) and DetEval (tr 0.8 / tp 0.4)."""
    size = args.img_size
    if forward is None:
        forward = lambda db: trainer._eval_step(state, db)[0]
    host_rep = SegDetectorRepresenter(
        thresh=args.thresh, box_thresh=args.box_thresh,
        unclip_ratio=args.unclip_ratio)
    # name -> (representer, is_output_polygon)
    reps = {
        "host": (host_rep, False),
        "device": (DeviceBoxRepresenter(
            thresh=args.thresh, box_thresh=args.box_thresh,
            unclip_ratio=args.unclip_ratio), False),
    }
    if getattr(args, "polygon", False):
        # the reference's CTW1500 line-level protocol: polygon-mode
        # postprocess (src/postprocess.py:54-104) on host, plus the
        # device-assisted crop path (CC on device, contours on K crops)
        reps["host_poly"] = (host_rep, True)
        try:
            reps["device_poly"] = (DevicePolyRepresenter(
                thresh=args.thresh, box_thresh=args.box_thresh,
                unclip_ratio=args.unclip_ratio), True)
        except ValueError as e:
            # box_thresh <= thresh: outside the regime where the device
            # poly path matches the host (see DevicePolyRepresenter);
            # report host polygon rows only rather than diverging ones
            print(f"# device_poly skipped: {e}", file=sys.stderr)
    evaluators = {
        "iou_pascal": DetectionIoUEvaluator(iou_constraint=0.4,
                                            area_precision_constraint=0.8),
        "deteval": DetectionDetEvalEvaluator(),
    }
    raw = {(r, e): [] for r in reps for e in evaluators}
    wall = {r: 0.0 for r in reps}
    n_images = 0
    warmed = False
    dump_dir = getattr(args, "dump_eval_dir", None)
    if dump_dir:
        os.makedirs(dump_dir, exist_ok=True)
    batch_idx = -1
    for batch in test_loader:
        batch_idx += 1
        if not warmed:
            # untimed warm-up: first-call jit compiles through the tunnel
            # (tens of seconds) would otherwise be charged to whichever
            # representer runs first (VERDICT r2 weak #3). The warm
            # forward's result is REUSED as the measured pass's forward
            # below — re-uploading + re-running the first batch would
            # double its device work on the upload-bound link for nothing.
            # (not bound to a local: the batch's device buffers would stay
            # referenced for the whole eval)
            wp = forward(shard_batch(array_batch(batch), trainer.mesh))
            wshape = {"shape": [(size, size)] * wp.shape[0]}
            for rname, (rep, is_poly) in reps.items():
                rep(wshape,
                    wp if rname.startswith("device") else np.asarray(wp),
                    is_output_polygon=is_poly)
            warmed = True
            preds = wp
        else:
            device_batch = shard_batch(array_batch(batch), trainer.mesh)
            preds = forward(device_batch)
        # materialize the host copy ONCE, untimed: the D2H transfer
        # (~50 s/400 images through the tunnel) otherwise lands entirely
        # on whichever host representer runs first, making per-path wall
        # comparisons meaningless (the CTW artifact showed host rect 85 s
        # vs host poly 1.9 s for near-identical geometry work)
        preds_np = np.asarray(preds)
        n_images += preds.shape[0]
        batch_shape = {"shape": [(size, size)] * preds.shape[0]}
        dump_rec = {}
        for rname, (rep, is_poly) in reps.items():
            t0 = time.perf_counter()
            pred_in = preds if rname.startswith("device") else preds_np
            box_list, score_list = rep(batch_shape, pred_in,
                                       is_output_polygon=is_poly)
            wall[rname] += time.perf_counter() - t0
            if dump_dir:
                dump_rec[rname] = (box_list, score_list)
            for ename, ev in evaluators.items():
                qm = QuadMetric(evaluator=ev)
                raw[(rname, ename)].append(
                    qm.validate_measure(batch, (box_list, score_list)))
        if dump_dir:
            import pickle

            np.savez_compressed(
                os.path.join(dump_dir, f"batch_{batch_idx:03d}.npz"),
                preds=np.asarray(preds, np.float32))
            with open(os.path.join(dump_dir,
                                   f"batch_{batch_idx:03d}.boxes.pkl"),
                      "wb") as f:
                pickle.dump(dump_rec, f)
    out = {}
    for (rname, ename), metrics in raw.items():
        qm = QuadMetric(evaluator=evaluators[ename])
        gathered = qm.gather_measure(metrics)
        out.setdefault(rname, {})[ename] = {
            "precision": round(gathered["precision"].avg, 4),
            "recall": round(gathered["recall"].avg, 4),
            "hmean": round(gathered["fmeasure"].avg, 4),
        }
    for rname in reps:
        out[rname]["postprocess_wall_s"] = round(wall[rname], 2)
    out["n_test_images"] = n_images
    return out


def warn_ctw_polygon_operating_point(args) -> bool:
    """CTW1500 line-level polygon eval COLLAPSES at the reference-default
    unclip 1.5: measured DetEval F .27 vs .82 at 2.5 (docs/PERFORMANCE.md
    §CTW — shrunk line-level kernels under-cover their GT lines, so every
    match fails DetEval's coverage gate). The reference exposes the same
    foot-gun silently (``src/postprocess.py:34`` default 1.5); here the
    wrong operating point at least announces itself."""
    if (getattr(args, "dataset_format", "") == "ctw1500"
            and getattr(args, "polygon", False)
            and args.unclip_ratio < 2.0):
        print(
            f"# WARNING: ctw1500 polygon mode at unclip_ratio="
            f"{args.unclip_ratio} is a measured quality collapse "
            f"(DetEval F .27 at 1.5 vs .82 at 2.5 on the CTW bench — "
            f"docs/PERFORMANCE.md). Line-level polygon evals should run "
            f"--unclip_ratio 2.5.", file=sys.stderr)
        return True
    return False


def main(args=None):
    args = args or load_args()
    warn_ctw_polygon_operating_point(args)
    cfg = build_cfg(args)
    train_ds = _limit(build_dataset(cfg, is_training=True), args.limit_train)
    test_ds = _limit(build_dataset(cfg, is_training=False), args.limit_test)
    train_loader = DataLoader(train_ds, int(cfg.hps.batch_size),
                              shuffle=True)
    test_loader = DataLoader(test_ds, int(cfg.hps.test_batch_size))
    trainer = Trainer(cfg, train_loader, test_loader)
    t0 = time.perf_counter()
    history = []
    if args.eval_only:
        assert args.checkpoint, "--eval_only requires --checkpoint"
        state = trainer.resume_state(args.checkpoint)
    else:
        state = trainer.init_state()
        if args.checkpoint:
            state = trainer.resume_state(args.checkpoint)
        for epoch in range(int(cfg.hps.no_epochs)):
            state, train_loss, _, _ = trainer.train_epoch(state, epoch)
            entry = {"epoch": epoch, "train_loss": round(train_loss, 5)}
            if args.eval_every and (epoch + 1) % args.eval_every == 0:
                test_loss, _, recall, precision, hmean = \
                    trainer.eval_epoch(state)
                entry.update({"test_loss": round(test_loss, 5),
                              "hmean": round(hmean, 4)})
                if trainer.lrs_mode == "reduce":
                    trainer.plateau.step(test_loss)
            trainer.logger.info("epoch %d: %s", epoch, entry)
            history.append(entry)
    train_wall = time.perf_counter() - t0

    train_config = {
        "backbone": args.backbone, "neck": args.neck,
        "reduction": args.reduction,
        "pretrained_backbone": bool(args.pretrained_backbone),
        "epochs": args.epochs, "batch_size": args.batch_size,
        "lr": args.lr, "lrs": args.lrs,
        "dcn_offset_lr_mult": args.dcn_offset_lr_mult,
    }
    # Save BEFORE the final eval: the eval dispatches fresh compiles through
    # the tunnel, which occasionally drops (remote_compile connection
    # refused); saving first means a failed eval never loses the training.
    if args.save_checkpoint:
        from ..train.checkpoints import save_checkpoint

        host_state = jax.device_get(state)
        save_checkpoint(args.save_checkpoint,
                        {"params": host_state.params,
                         "batch_stats": host_state.batch_stats,
                         "opt_state": host_state.opt_state,
                         "step": host_state.step})
        # provenance sidecar so later --eval_only reports can record the
        # checkpoint's ACTUAL training config instead of CLI defaults
        # (VERDICT r2 weak #4)
        with open(args.save_checkpoint + ".train_config.json", "w") as f:
            json.dump(train_config, f)
        # a fine-tuned PRUNED model keeps its architecture widths
        # (models/prune.py sidecar) so the new checkpoint reloads correctly
        if cfg.model.widths:
            from ..models.prune import save_widths

            save_widths(args.save_checkpoint, dict(cfg.model.widths))

    if args.no_final_eval:
        results, eval_wall = {"skipped": True}, 0.0
    else:
        forward = (make_quant_forward(trainer, state, test_loader, args)
                   if args.quant else None)
        t0 = time.perf_counter()
        results = full_eval(trainer, state, test_loader, args,
                            forward=forward)
        eval_wall = time.perf_counter() - t0

    if args.eval_only:
        sidecar = (args.checkpoint or "") + ".train_config.json"
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                train_config = json.load(f)
        else:
            train_config = {"unknown": "checkpoint has no "
                            ".train_config.json sidecar; training "
                            "hyperparameters not recorded"}

    report = {
        "config": {
            "eval_only": bool(args.eval_only),
            "checkpoint": args.checkpoint,
            "train_config": train_config,
            "thresh": args.thresh,
            "box_thresh": args.box_thresh,
            "unclip_ratio": args.unclip_ratio,
            "n_train": len(train_ds), "n_test": len(test_ds),
            "backend": jax.default_backend(),
            "quant": bool(args.quant), "quant_head": bool(args.quant_head),
        },
        "train_wall_s": round(train_wall, 1),
        "eval_wall_s": round(eval_wall, 1),
        "history": history,
        "results": results,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["results"], indent=1))
    return report


if __name__ == "__main__":
    main()
