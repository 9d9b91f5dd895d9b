"""Cross-phase localizer for the in-process device-row deficit.

diag_inproc.py dumps, per phase, every eval batch's prob/thresh maps (the
D2H copy) and each representer's live box outputs. Phases A (fresh) and B
(same params after 1000 train steps) evaluate IDENTICAL model state, so:

- maps A == maps B  and boxes A != boxes B  -> the device box kernel
  dispatch diverges with process history (compile cache / memory pressure);
- maps A != maps B                          -> the eval FORWARD itself
  diverges (donation / buffer reuse), and the box deficit is downstream;
- everything equal but rows differ          -> metric-side nondeterminism
  (would be a bug in this harness, not the device path).

    python compare_phases.py /tmp/inproc_dumps A_fresh B_same_params_after_training
"""
import glob
import os
import pickle
import sys

import numpy as np

root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/inproc_dumps"
pa = sys.argv[2] if len(sys.argv) > 2 else "A_fresh"
pb = sys.argv[3] if len(sys.argv) > 3 else "B_same_params_after_training"

da, db = os.path.join(root, pa), os.path.join(root, pb)
npz_a = sorted(glob.glob(os.path.join(da, "batch_*.npz")))
npz_b = sorted(glob.glob(os.path.join(db, "batch_*.npz")))
assert len(npz_a) == len(npz_b) and npz_a, (len(npz_a), len(npz_b))

map_maxdiff = 0.0
map_diff_batches = []
box_diff_batches = []
img_idx = 0
for fa, fb in zip(npz_a, npz_b):
    A = np.load(fa)["preds"]
    B = np.load(fb)["preds"]
    d = float(np.max(np.abs(A - B))) if A.shape == B.shape else float("inf")
    map_maxdiff = max(map_maxdiff, d)
    if d != 0.0:
        per_img = np.max(np.abs(A - B), axis=tuple(range(1, A.ndim)))
        bad = np.nonzero(per_img)[0]
        map_diff_batches.append(
            (os.path.basename(fa), d, [int(img_idx + i) for i in bad]))
    with open(fa.replace(".npz", ".boxes.pkl"), "rb") as f:
        ba = pickle.load(f)
    with open(fb.replace(".npz", ".boxes.pkl"), "rb") as f:
        bb = pickle.load(f)
    for rep in ba:
        la, sa = ba[rep]
        lb, sb = bb[rep]
        for i, (xa, xb) in enumerate(zip(la, lb)):
            xa, xb = np.asarray(xa, np.float64), np.asarray(xb, np.float64)
            same = (xa.shape == xb.shape and
                    (xa.size == 0 or float(np.max(np.abs(xa - xb))) < 1e-3))
            if not same:
                box_diff_batches.append(
                    (rep, os.path.basename(fa), int(img_idx + i),
                     xa.shape, xb.shape))
    img_idx += A.shape[0]

print(f"batches: {len(npz_a)}  images: {img_idx}")
print(f"map maxdiff {pa} vs {pb}: {map_maxdiff}")
if map_diff_batches:
    print(f"map-differing batches ({len(map_diff_batches)}):")
    for rec in map_diff_batches[:10]:
        print("  ", rec)
else:
    print("maps BITWISE IDENTICAL across phases")
if box_diff_batches:
    reps = sorted({r for r, *_ in box_diff_batches})
    print(f"box-differing (rep, batch, image): {len(box_diff_batches)}")
    for rep in reps:
        rows = [r for r in box_diff_batches if r[0] == rep]
        print(f"  {rep}: {len(rows)} images, first 5: {rows[:5]}")
else:
    print("box outputs IDENTICAL across phases (all representers)")
