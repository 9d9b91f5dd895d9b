"""Drill into device-rect drops on CTW lines: for each host-kept box the
device path loses, locate the device component slot and report which gate
killed it (score? min-side? validity?)."""
import sys

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from db_text_minimal_tpu.cli.quality_bench import (build_cfg, load_args,
                                                   _limit)
from db_text_minimal_tpu.data.datasets import DataLoader, build_dataset
from db_text_minimal_tpu.postprocess import (DeviceBoxRepresenter,
                                             SegDetectorRepresenter)
from db_text_minimal_tpu.train.trainer import Trainer, array_batch, \
    shard_batch
from db_text_minimal_tpu.ops.pallas.cc import device_boxes

N_IMAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 24

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
host_rep = SegDetectorRepresenter(thresh=args.thresh,
                                  box_thresh=args.box_thresh,
                                  unclip_ratio=args.unclip_ratio)
dev_rect = DeviceBoxRepresenter(thresh=args.thresh,
                                box_thresh=args.box_thresh,
                                unclip_ratio=args.unclip_ratio)

n_done = 0
for batch in test_loader:
    db = shard_batch(array_batch(batch), trainer.mesh)
    preds = trainer._eval_step(state, db)[0]
    preds_np = np.asarray(preds, np.float32)
    bs = {"shape": [(size, size)] * preds_np.shape[0]}
    hb_r, hs_r = host_rep(bs, preds_np, is_output_polygon=False)
    db_r, ds_r = dev_rect(bs, preds, is_output_polygon=False)
    for i in range(preds_np.shape[0]):
        idx = n_done
        n_done += 1
        hc = [np.asarray(b, np.float64).reshape(-1, 2).mean(axis=0)
              for b in hb_r[i]]
        dc = [np.asarray(b, np.float64).reshape(-1, 2).mean(axis=0)
              for b in db_r[i]]
        missing = []
        for k, c in enumerate(hc):
            if not dc or min(np.linalg.norm(c - x) for x in dc) > 20:
                missing.append(k)
        if not missing:
            continue
        # all pre-keep slots from the kernel
        pmap = preds_np[i]
        if pmap.ndim == 3:
            pmap = pmap[..., 0]
        corners, scores, keep = device_boxes(
            pmap[None], thresh=args.thresh,
            box_thresh=args.box_thresh,
            unclip_ratio=args.unclip_ratio, unclip=False)
        corners = np.asarray(corners)[0]
        scores = np.asarray(scores)[0]
        keep = np.asarray(keep)[0]
        slot_c = corners.mean(axis=1)
        for k in missing:
            d = np.linalg.norm(slot_c - hc[k], axis=1)
            j = int(np.argmin(d))
            sides = [np.linalg.norm(corners[j][1] - corners[j][0]),
                     np.linalg.norm(corners[j][2] - corners[j][1])]
            # host-side diagnostics for the same region
            hbox = np.asarray(hb_r[i][k], np.float64).reshape(-1, 2)
            print(f"img {idx} missing host box {k}: host_score="
                  f"{float(hs_r[i][k]):.4f} | nearest slot {j} "
                  f"dist={d[j]:.1f} keep={bool(keep[j])} "
                  f"score={float(scores[j]):.4f} "
                  f"sides=({sides[0]:.1f},{sides[1]:.1f}) "
                  f"box_thresh={args.box_thresh}")
    if n_done >= N_IMAGES:
        break
print("done", n_done)
