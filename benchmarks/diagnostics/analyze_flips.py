"""Per-image device-vs-host postprocess flip analysis (VERDICT r2 ask #1).

Consumes the full eval-map dump (dump_maps.py), runs BOTH representers on
CPU (the box kernel is bitwise TPU==CPU on dumped maps — round-2 bounding
work), computes per-image DetEval/IoU hmean for each path, ranks the flips,
and prints per-box diagnostics for the worst images.

    python analyze_flips.py /tmp/hb40_maps_full.npz [top_n]
"""
import pickle
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

from db_text_minimal_tpu.metrics.deteval import DetectionDetEvalEvaluator
from db_text_minimal_tpu.metrics.iou import DetectionIoUEvaluator
from db_text_minimal_tpu.metrics.quad import QuadMetric
from db_text_minimal_tpu.postprocess import (DeviceBoxRepresenter,
                                             SegDetectorRepresenter)

THRESH, BOX_THRESH, UNCLIP = 0.25, 0.50, 1.5
SIZE = 640


def per_image_metrics(maps, anns, tags, top_n=15):
    host = SegDetectorRepresenter(thresh=THRESH, box_thresh=BOX_THRESH,
                                  unclip_ratio=UNCLIP)
    import os

    dev = DeviceBoxRepresenter(
        thresh=THRESH, box_thresh=BOX_THRESH, unclip_ratio=UNCLIP,
        hole_filled_score=os.environ.get("HOLE_SCORE", "1") != "0")
    evaluators = {
        "iou": DetectionIoUEvaluator(iou_constraint=0.4,
                                     area_precision_constraint=0.8),
        "det": DetectionDetEvalEvaluator(),
    }
    rows = []
    raw = {(r, e): [] for r in ("host", "dev") for e in evaluators}
    bs = 16
    for start in range(0, maps.shape[0], bs):
        chunk = maps[start:start + bs]
        n = chunk.shape[0]
        batch_shape = {"shape": [(SIZE, SIZE)] * n}
        h_boxes, h_scores = host(batch_shape, chunk[..., None])
        d_boxes, d_scores = dev(batch_shape, jax.numpy.asarray(chunk))
        batch = {"anns": anns[start:start + n],
                 "ignore_tags": tags[start:start + n],
                 "shape": batch_shape["shape"]}
        for ename, ev in evaluators.items():
            qm = QuadMetric(evaluator=ev)
            mh = qm.validate_measure(batch, (h_boxes, h_scores))
            md = qm.validate_measure(batch, (d_boxes, d_scores))
            raw[("host", ename)].append(mh)
            raw[("dev", ename)].append(md)
            if ename != "det":
                continue
            for i, (a, b) in enumerate(zip(mh, md)):
                rows.append({
                    "img": start + i,
                    "host_hmean": a["hmean"], "dev_hmean": b["hmean"],
                    "host_nboxes": len(h_boxes[i]),
                    "dev_nboxes": len(d_boxes[i]),
                    "host_scores": [round(float(s), 3)
                                    for s in np.asarray(h_scores[i])],
                    "dev_scores": [round(float(s), 3)
                                   for s in np.asarray(d_scores[i])],
                })
        print("chunk", start, flush=True)
    # aggregates
    for (rname, ename), metrics in raw.items():
        qm = QuadMetric(evaluator=evaluators[ename])
        g = qm.gather_measure(metrics)
        print(rname, ename, "P", round(g["precision"].avg, 4),
              "R", round(g["recall"].avg, 4),
              "F", round(g["fmeasure"].avg, 4), flush=True)
    rows.sort(key=lambda r: r["dev_hmean"] - r["host_hmean"])
    print("\n=== worst device flips (DetEval) ===")
    for r in rows[:top_n]:
        print(r)
    print("\n=== flip histogram ===")
    deltas = np.array([r["dev_hmean"] - r["host_hmean"] for r in rows])
    print("images with dev<host:", int((deltas < -1e-6).sum()),
          " dev>host:", int((deltas > 1e-6).sum()),
          " equal:", int((np.abs(deltas) <= 1e-6).sum()))
    print("mean delta:", float(deltas.mean()))
    with open("/tmp/flip_rows.pkl", "wb") as f:
        pickle.dump(rows, f)


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    maps = np.load(path)["maps"][..., 0]
    with open(path + ".anns.pkl", "rb") as f:
        meta = pickle.load(f)
    per_image_metrics(maps, meta["anns"], meta["ignore_tags"], top_n)


if __name__ == "__main__":
    main()
