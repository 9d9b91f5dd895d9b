"""Metric-visible device-vs-host comparison on CTW: per-image IoU/DetEval
matched counts through the real QuadMetric pipeline (zero-padded reference
quirk boxes filtered the same way the benchmark filters them)."""
import sys

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from db_text_minimal_tpu.cli.quality_bench import (build_cfg, load_args,
                                                   _limit)
from db_text_minimal_tpu.data.datasets import DataLoader, build_dataset
from db_text_minimal_tpu.metrics.iou import DetectionIoUEvaluator
from db_text_minimal_tpu.metrics.deteval import DetectionDetEvalEvaluator
from db_text_minimal_tpu.metrics.quad import QuadMetric
from db_text_minimal_tpu.postprocess import (DeviceBoxRepresenter,
                                             DevicePolyRepresenter,
                                             SegDetectorRepresenter)
from db_text_minimal_tpu.train.trainer import Trainer, array_batch, \
    shard_batch

N_IMAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 120
START = int(sys.argv[2]) if len(sys.argv) > 2 else 0

args = load_args([
    "--data_dir", "/tmp/ctw_bench", "--dataset_format", "ctw1500",
    "--polygon", "--eval_only", "--checkpoint", "/tmp/hb_models/ctw20.ckpt",
    "--test_batch_size", "8", "--limit_test", str(START + N_IMAGES),
    "--out", "/tmp/diag_ctw_unused.json",
])
cfg = build_cfg(args)
test_ds = _limit(build_dataset(cfg, is_training=False), args.limit_test)
test_loader = DataLoader(test_ds, int(cfg.hps.test_batch_size))
trainer = Trainer(cfg, test_loader, test_loader)
state = trainer.resume_state(args.checkpoint)

size = args.img_size
host_rep = SegDetectorRepresenter(thresh=args.thresh,
                                  box_thresh=args.box_thresh,
                                  unclip_ratio=args.unclip_ratio)
reps = {
    "host": (host_rep, False),
    "device": (DeviceBoxRepresenter(
        thresh=args.thresh, box_thresh=args.box_thresh,
        unclip_ratio=args.unclip_ratio), False),
    "host_poly": (host_rep, True),
    "device_poly": (DevicePolyRepresenter(
        thresh=args.thresh, box_thresh=args.box_thresh,
        unclip_ratio=args.unclip_ratio), True),
}
evaluators = {
    "iou": DetectionIoUEvaluator(iou_constraint=0.4,
                                 area_precision_constraint=0.8),
    "det": DetectionDetEvalEvaluator(),
}

# per-image per-rep per-eval (matched, gt_care, det_care)
stats = {r: {e: [] for e in evaluators} for r in reps}
n_done = 0
for batch in test_loader:
    if n_done + len(batch["anns"]) <= START:
        n_done += len(batch["anns"])
        continue
    db = shard_batch(array_batch(batch), trainer.mesh)
    preds = trainer._eval_step(state, db)[0]
    preds_np = np.asarray(preds, np.float32)
    bs = {"shape": [(size, size)] * preds_np.shape[0],
          "anns": batch["anns"], "ignore_tags": batch["ignore_tags"]}
    for rname, (rep, is_poly) in reps.items():
        pred_in = preds if rname.startswith("device") else preds_np
        out = rep(bs, pred_in, is_output_polygon=is_poly)
        for ename, ev in evaluators.items():
            qm = QuadMetric(evaluator=ev)
            res = qm.validate_measure(batch, out,
                                      is_output_polygon=is_poly)
            stats[rname][ename].append(res)
    n_done += preds_np.shape[0]
    if n_done >= START + N_IMAGES:
        break

# summarize: total hmean per rep per eval; then per-image flips
for ename in evaluators:
    print(f"== {ename}")
    for rname in reps:
        qm = QuadMetric(evaluator=evaluators[ename])
        g = qm.gather_measure(stats[rname][ename])
        print(f"  {rname:12s} P={g['precision'].avg:.4f} "
              f"R={g['recall'].avg:.4f} F={g['fmeasure'].avg:.4f}")
    # per-image recall flips host vs device (rect + poly)
    for pair in (("host", "device"), ("host_poly", "device_poly")):
        a, b = pair
        flips = []
        for bi, (ra, rb) in enumerate(zip(stats[a][ename],
                                          stats[b][ename])):
            for ii, (ma, mb) in enumerate(zip(ra, rb)):
                da = ma.get("detMatched", ma.get("matched", 0))
                dbm = mb.get("detMatched", mb.get("matched", 0))
                if da != dbm:
                    flips.append((bi * 8 + ii, da, dbm,
                                  ma.get("detCare"), mb.get("detCare")))
        print(f"  {a} vs {b}: {len(flips)} images with matched-count "
              f"diffs: {flips[:12]}")
print("done", n_done - START)
