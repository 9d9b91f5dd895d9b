"""Polygon-mode unclip-ratio sweep on the CTW line-level benchmark: the
1.5-ratio unclip under-recovers a 0.4-shrunk line (≈0.4 area recall, below
DetEval's tr=0.8 gate). Measure DetEval/IoU vs ratio to document the
line-level operating point. One forward pass, ratios swept over the host
polygon representer."""
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
from db_text_minimal_tpu.postprocess import SegDetectorRepresenter
from db_text_minimal_tpu.train.trainer import Trainer, array_batch, \
    shard_batch

N_IMAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 120
RATIOS = [1.5, 2.0, 2.5, 3.0, 3.5]

args = load_args([
    "--data_dir", "/tmp/ctw_bench", "--dataset_format", "ctw1500",
    "--eval_only", "--checkpoint", "/tmp/hb_models/ctw20.ckpt",
    "--test_batch_size", "8", "--limit_test", str(N_IMAGES),
    "--out", "/tmp/diag_ctw_unused.json",
])
cfg = build_cfg(args)
test_ds = _limit(build_dataset(cfg, is_training=False), args.limit_test)
test_loader = DataLoader(test_ds, int(cfg.hps.test_batch_size))
trainer = Trainer(cfg, test_loader, test_loader)
state = trainer.resume_state(args.checkpoint)

size = args.img_size
cached = []
for batch in test_loader:
    db = shard_batch(array_batch(batch), trainer.mesh)
    preds = np.asarray(trainer._eval_step(state, db)[0], np.float32)
    cached.append((batch, preds))
print(f"forwarded {sum(p.shape[0] for _, p in cached)} images",
      flush=True)

evaluators = {
    "iou": DetectionIoUEvaluator(iou_constraint=0.4,
                                 area_precision_constraint=0.8),
    "det": DetectionDetEvalEvaluator(),
}
for ratio in RATIOS:
    rep = SegDetectorRepresenter(thresh=args.thresh,
                                 box_thresh=args.box_thresh,
                                 unclip_ratio=ratio)
    raw = {e: [] for e in evaluators}
    for batch, preds in cached:
        bs = {"shape": [(size, size)] * preds.shape[0]}
        out = rep(bs, preds, is_output_polygon=True)
        for ename, ev in evaluators.items():
            qm = QuadMetric(evaluator=ev)
            raw[ename].append(qm.validate_measure(batch, out,
                                                  is_output_polygon=True))
    line = f"ratio {ratio}: "
    for ename in evaluators:
        qm = QuadMetric(evaluator=evaluators[ename])
        g = qm.gather_measure(raw[ename])
        line += (f"{ename} P={g['precision'].avg:.4f} "
                 f"R={g['recall'].avg:.4f} F={g['fmeasure'].avg:.4f}  ")
    print(line, flush=True)
