"""TPU-vs-CPU bitwise comparison of the device-boxes kernel over the FULL
dumped eval-map set (VERDICT r2 ask #1 mechanism hunt: the CPU run of the
kernel is at parity with host on the 40-ep maps, so any remaining gap must
be TPU-execution divergence).

Three phases (JAX_PLATFORMS is pinned to axon in this env, so the CPU run
needs its own process):

    python compare_kernel.py run tpu /tmp/hb40_maps_full.npz /tmp/k_tpu.npz
    python compare_kernel.py run cpu /tmp/hb40_maps_full.npz /tmp/k_cpu.npz
    python compare_kernel.py diff /tmp/k_tpu.npz /tmp/k_cpu.npz
"""
import sys

import numpy as np


def run(platform, maps_path, out_path):
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from db_text_minimal_tpu.ops.pallas.cc import device_boxes

    if platform != "cpu":
        assert jax.default_backend() not in ("cpu",), jax.devices()
    maps = np.load(maps_path)["maps"][..., 0].astype(np.float32)
    outs = []
    for start in range(0, maps.shape[0], 16):
        chunk = maps[start:start + 16]
        corners, scores, keep = device_boxes(
            chunk, thresh=0.25, box_thresh=0.50, unclip_ratio=1.5,
            min_size=3, max_components=1000, unclip=False)
        outs.append((np.asarray(corners, np.float32),
                     np.asarray(scores, np.float32), np.asarray(keep)))
        print(platform, "chunk", start, flush=True)
    np.savez_compressed(out_path,
                        corners=np.concatenate([o[0] for o in outs]),
                        scores=np.concatenate([o[1] for o in outs]),
                        keep=np.concatenate([o[2] for o in outs]))
    print("saved", out_path)


def diff(a_path, b_path):
    a = np.load(a_path)
    b = np.load(b_path)
    keep_flips = (a["keep"] != b["keep"]).sum(axis=1)
    print("images with keep flips:", int((keep_flips > 0).sum()),
          "total flips:", int(keep_flips.sum()))
    both = a["keep"] & b["keep"]
    sd = np.abs(a["scores"] - b["scores"])[both]
    cd = np.abs(a["corners"] - b["corners"])[both.nonzero()[0],
                                             both.nonzero()[1]]
    print("score maxdiff (kept both):", float(sd.max()) if sd.size else 0.0)
    print("corner maxdiff (kept both):",
          float(cd.max()) if cd.size else 0.0)
    if cd.size:
        print("corner diff percentiles (px):",
              np.percentile(cd.reshape(cd.shape[0], -1).max(1),
                            [50, 90, 99, 100]).round(4).tolist())
    worst = np.argsort(-keep_flips)[:10]
    for i in worst:
        if keep_flips[i] == 0:
            break
        fl = np.where(a["keep"][i] != b["keep"][i])[0]
        print(f"img {i}: flips at slots {fl.tolist()} "
              f"a_scores {a['scores'][i][fl].round(4).tolist()} "
              f"b_scores {b['scores'][i][fl].round(4).tolist()}")


if __name__ == "__main__":
    if sys.argv[1] == "run":
        run(sys.argv[2], sys.argv[3], sys.argv[4])
    else:
        diff(sys.argv[2], sys.argv[3])
