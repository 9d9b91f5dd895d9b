"""Diagnose device-vs-host postprocess divergence on CTW-style curved
lines (metrics_ctw_poly.json shows ~2 IoU-pt device deficits in BOTH rect
and polygon modes, while the TotalText-style hard bench is at parity).

Runs the ctw20 checkpoint forward on CPU over a small eval subset, then
compares box/polygon sets per image between host and device paths and
drills into the first divergent component per image (LUT miss? score
delta? geometry delta?).
"""
import sys

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np

from db_text_minimal_tpu.cli.quality_bench import (build_cfg, load_args,
                                                   _limit)
from db_text_minimal_tpu.data.datasets import DataLoader, build_dataset
from db_text_minimal_tpu.postprocess import (DeviceBoxRepresenter,
                                             DevicePolyRepresenter,
                                             SegDetectorRepresenter)
from db_text_minimal_tpu.train.trainer import Trainer, array_batch, \
    shard_batch
from db_text_minimal_tpu.ops import geometry as geo

N_IMAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 48

args = load_args([
    "--data_dir", "/tmp/ctw_bench", "--dataset_format", "ctw1500",
    "--polygon", "--eval_only", "--checkpoint", "/tmp/hb_models/ctw20.ckpt",
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
dev_poly = DevicePolyRepresenter(thresh=args.thresh,
                                 box_thresh=args.box_thresh,
                                 unclip_ratio=args.unclip_ratio)


def centers(boxes):
    return [np.asarray(b, np.float64).reshape(-1, 2).mean(axis=0)
            for b in boxes]


def summarize_pair(tag, hb, hs, db, ds):
    """Count diffs + matched-pair geometry/score deltas."""
    out = {"tag": tag, "n_host": len(hb), "n_dev": len(db),
           "only_host": [], "only_dev": [], "score_d": 0.0, "geo_d": 0.0}
    hc, dc = centers(hb), centers(db)
    used = set()
    for i, c in enumerate(hc):
        if not dc:
            out["only_host"].append(i)
            continue
        d = [np.linalg.norm(c - x) for x in dc]
        j = int(np.argmin(d))
        if d[j] > 20 or j in used:
            out["only_host"].append(i)
            continue
        used.add(j)
        out["score_d"] = max(out["score_d"], abs(float(hs[i]) -
                                                 float(ds[j])))
        a = np.asarray(hb[i], np.float64).reshape(-1, 2)
        b = np.asarray(db[j], np.float64).reshape(-1, 2)
        if a.shape == b.shape:
            out["geo_d"] = max(out["geo_d"], float(np.abs(a - b).max()))
    out["only_dev"] = [j for j in range(len(db)) if j not in used]
    return out


def drill_poly(pred_map, missing_center):
    """Why did device_poly drop the polygon near missing_center?"""
    from db_text_minimal_tpu.ops.pallas.cc import device_poly_stats

    bitmap_host = (pred_map > args.thresh).astype(np.uint8)
    packed, bboxes, scores, valid = device_poly_stats(
        pred_map[None], thresh=args.thresh, max_components=1000)
    bitmap_dev = np.unpackbits(np.asarray(packed)[0], axis=-1)[:, :size]
    lut = {tuple(bb): float(s) for bb, s, v in
           zip(np.asarray(bboxes)[0], np.asarray(scores)[0],
               np.asarray(valid)[0]) if v}
    bit_diff = int((bitmap_host != bitmap_dev).sum())
    contours = geo.find_contours(bitmap_dev)
    best, best_d = None, 1e9
    for contour in contours:
        c = np.asarray(contour, np.float64)
        d = np.linalg.norm(c.mean(axis=0) - missing_center)
        if d < best_d:
            best, best_d = c, d
    if best is None:
        return {"bit_diff": bit_diff, "note": "no contour near center"}
    key = (int(best[:, 0].min()), int(best[:, 1].min()),
           int(best[:, 0].max()), int(best[:, 1].max()))
    eps = 0.005 * geo.polygon_perimeter(best)
    approx = geo.approx_poly_dp(best, eps)
    rec = {"bit_diff": bit_diff, "contour_pts": int(best.shape[0]),
           "approx_pts": int(approx.shape[0]),
           "lut_hit": key in lut,
           "dev_score": lut.get(key),
           "host_score": None, "center_dist": round(best_d, 1)}
    # host score of the same contour (filled outer contour mean)
    try:
        rec["host_score"] = round(
            float(host_rep.box_score_fast(pred_map, best)), 4)
    except Exception as e:  # noqa: BLE001
        rec["host_score"] = f"err {e}"
    if not rec["lut_hit"]:
        # nearest LUT key
        keys = list(lut.keys())
        if keys:
            dk = [sum(abs(a - b) for a, b in zip(k, key)) for k in keys]
            j = int(np.argmin(dk))
            rec["nearest_key"] = (keys[j], key, "L1", int(dk[j]))
    return rec


n_done = 0
poly_divergent = rect_divergent = 0
for batch in test_loader:
    db = shard_batch(array_batch(batch), trainer.mesh)
    preds = trainer._eval_step(state, db)[0]
    preds_np = np.asarray(preds, np.float32)
    bs = {"shape": [(size, size)] * preds_np.shape[0]}
    hb_r, hs_r = host_rep(bs, preds_np, is_output_polygon=False)
    db_r, ds_r = dev_rect(bs, preds, is_output_polygon=False)
    hb_p, hs_p = host_rep(bs, preds_np, is_output_polygon=True)
    db_p, ds_p = dev_poly(bs, preds, is_output_polygon=True)
    for i in range(preds_np.shape[0]):
        idx = n_done
        n_done += 1
        r = summarize_pair("rect", hb_r[i], hs_r[i], db_r[i], ds_r[i])
        p = summarize_pair("poly", hb_p[i], hs_p[i], db_p[i], ds_p[i])
        for tag, s in (("rect", r), ("poly", p)):
            diverged = (s["only_host"] or s["only_dev"]
                        or s["score_d"] > 1e-3 or s["geo_d"] > 1.5)
            if not diverged:
                continue
            if tag == "rect":
                rect_divergent += 1
            else:
                poly_divergent += 1
            print(f"img {idx} {tag}: host={s['n_host']} dev={s['n_dev']} "
                  f"only_host={s['only_host']} only_dev={s['only_dev']} "
                  f"score_d={s['score_d']:.4f} geo_d={s['geo_d']:.1f}")
            if tag == "poly" and s["only_host"]:
                hc = centers(hb_p[i])
                for m in s["only_host"][:2]:
                    print("   drill:", drill_poly(preds_np[i], hc[m]))
    if n_done >= N_IMAGES:
        break

print(f"\n{n_done} images: rect divergent {rect_divergent}, "
      f"poly divergent {poly_divergent}")
