"""Diff the LIVE TPU postprocess outputs (quality_bench --dump_eval_dir,
boxes.pkl per batch) against a CPU recompute of the SAME code on the SAME
dumped maps. Any box-set mismatch is TPU-execution divergence in the
device kernels, localized to the exact images; host rows double as a
no-op sanity check (same host code, same maps).

    python diag_warm.py /tmp/warm_dumps [data_dir]
"""
import glob
import os
import pickle
import sys

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from db_text_minimal_tpu.cli.quality_bench import build_cfg, load_args
from db_text_minimal_tpu.data.datasets import DataLoader, build_dataset
from db_text_minimal_tpu.metrics.iou import DetectionIoUEvaluator
from db_text_minimal_tpu.metrics.deteval import DetectionDetEvalEvaluator
from db_text_minimal_tpu.metrics.quad import QuadMetric
from db_text_minimal_tpu.postprocess import (DeviceBoxRepresenter,
                                             SegDetectorRepresenter)

DUMP_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/warm_dumps"
DATA_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/hard_bench"

args = load_args(["--data_dir", DATA_DIR, "--eval_only",
                  "--checkpoint", "unused",
                  "--out", "/tmp/diag_warm_unused.json"])
cfg = build_cfg(args)
test_ds = build_dataset(cfg, is_training=False)
test_loader = DataLoader(test_ds, int(cfg.hps.test_batch_size))
size = args.img_size

host_rep = SegDetectorRepresenter(thresh=args.thresh,
                                  box_thresh=args.box_thresh,
                                  unclip_ratio=args.unclip_ratio)
dev_rep = DeviceBoxRepresenter(thresh=args.thresh,
                               box_thresh=args.box_thresh,
                               unclip_ratio=args.unclip_ratio)
evaluators = {
    "iou": DetectionIoUEvaluator(iou_constraint=0.4,
                                 area_precision_constraint=0.8),
    "det": DetectionDetEvalEvaluator(),
}

npzs = sorted(glob.glob(os.path.join(DUMP_DIR, "batch_*.npz")))
assert npzs, f"no dumps in {DUMP_DIR}"
batches = iter(test_loader)

mismatch_imgs = []
raw = {(src, e): [] for src in ("host", "tpu_dev", "cpu_dev")
       for e in evaluators}
n_done = 0
for npz_path in npzs:
    preds = np.load(npz_path)["preds"]
    with open(npz_path.replace(".npz", ".boxes.pkl"), "rb") as f:
        live = pickle.load(f)
    batch = next(batches)
    assert len(batch["anns"]) == preds.shape[0], "loader/dump misaligned"
    bs = {"shape": [(size, size)] * preds.shape[0]}
    cpu_host = host_rep(bs, preds, is_output_polygon=False)
    cpu_dev = dev_rep(bs, preds, is_output_polygon=False)
    tpu_dev = live["device"]
    tpu_host = live["host"]
    for i in range(preds.shape[0]):
        idx = n_done
        n_done += 1
        # sanity: host recompute == live host
        th, ch = np.asarray(tpu_host[0][i]), np.asarray(cpu_host[0][i])
        if th.shape != ch.shape or (th.size and
                                    np.abs(th - ch).max() > 1e-3):
            print(f"img {idx}: HOST recompute differs?! live={th.shape} "
                  f"cpu={ch.shape}")
        # the real question: live TPU device vs CPU device
        td, cd = np.asarray(tpu_dev[0][i]), np.asarray(cpu_dev[0][i])
        if td.shape != cd.shape:
            mismatch_imgs.append((idx, "count", td.shape, cd.shape))
            print(f"img {idx}: device COUNT tpu={td.shape} cpu={cd.shape}")
        elif td.size and np.abs(td.astype(np.float64)
                                - cd.astype(np.float64)).max() > 1.0:
            d = np.abs(td.astype(np.float64) - cd.astype(np.float64)).max()
            mismatch_imgs.append((idx, "geom", d))
            print(f"img {idx}: device GEOM maxdiff {d:.1f} px")
        sc_t = np.asarray(tpu_dev[1][i], np.float64)
        sc_c = np.asarray(cpu_dev[1][i], np.float64)
        if sc_t.shape == sc_c.shape and sc_t.size and \
                np.abs(sc_t - sc_c).max() > 1e-3:
            mismatch_imgs.append((idx, "score",
                                  float(np.abs(sc_t - sc_c).max())))
            print(f"img {idx}: device SCORE maxdiff "
                  f"{np.abs(sc_t - sc_c).max():.4f}")
    # component-count / slot-saturation stats (slot-cap eviction on
    # speckle-heavy soft maps is a candidate mechanism: round 2's bug at
    # cap 100 recurring at 1000)
    from db_text_minimal_tpu.ops.pallas.cc import connected_components
    for i in range(preds.shape[0]):
        bm = (preds[i, ..., 0] > args.thresh).astype(np.int32)
        lab = np.asarray(connected_components(bm))
        n_comp = len(np.unique(lab[lab >= 0]))
        if n_comp > 500:
            print(f"img {n_done - preds.shape[0] + i}: "
                  f"{n_comp} components (cap 1000!)")
    # metrics for all three sources
    for src, out in (("host", cpu_host), ("tpu_dev", tpu_dev),
                     ("cpu_dev", cpu_dev)):
        for ename, ev in evaluators.items():
            qm = QuadMetric(evaluator=ev)
            raw[(src, ename)].append(qm.validate_measure(batch, out))

print(f"\n{n_done} images; {len(mismatch_imgs)} tpu-vs-cpu device "
      f"mismatches")
for ename in evaluators:
    line = f"{ename}: "
    for src in ("host", "tpu_dev", "cpu_dev"):
        qm = QuadMetric(evaluator=evaluators[ename])
        g = qm.gather_measure(raw[(src, ename)])
        line += (f"{src} P={g['precision'].avg:.4f} "
                 f"R={g['recall'].avg:.4f} F={g['fmeasure'].avg:.4f}  ")
    print(line)
