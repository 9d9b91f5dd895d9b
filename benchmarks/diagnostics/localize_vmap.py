"""Discriminate vmap-lowering divergence: run the device-boxes stages
VMAPPED over a batch vs SINGLE-map on the same backend and diff.

    python localize_vmap.py /tmp/hb40_maps_full.npz tpu 0 16
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

from localize_kernel import stages


def main():
    path, platform = sys.argv[1], sys.argv[2]
    start, n = int(sys.argv[3]), int(sys.argv[4])
    maps = np.load(path)["maps"][..., 0].astype(np.float32)[start:start + n]
    dev = jax.devices("cpu")[0] if platform == "cpu" else jax.devices()[0]
    x = jax.device_put(jnp.asarray(maps), dev)

    vm = jax.jit(jax.vmap(stages))
    batched = {k: np.asarray(v) for k, v in vm(x).items()}
    single_fn = jax.jit(stages)
    for i in range(n):
        out = {k: np.asarray(v) for k, v in single_fn(x[i]).items()}
        for key in ("bitmap", "labels", "keyed", "valid_root", "scores",
                    "sides", "ang", "valid", "keep"):
            a, b = batched[key][i], out[key]
            if a.dtype == np.bool_ or np.issubdtype(a.dtype, np.integer):
                neq = int((a != b).sum())
                if neq:
                    print(f"img {start + i} {key}: mismatches={neq}")
                    if key in ("valid", "keep"):
                        fl = np.where(a != b)[0][:10]
                        print(f"  slots {fl.tolist()} batched="
                              f"{a[fl].tolist()} single={b[fl].tolist()}")
            else:
                mask = out["valid"]
                if key in ("scores", "sides", "ang"):
                    d = np.abs(a - b)[mask]
                else:
                    d = np.abs(a - b)
                if d.size and d.max() > 1e-4:
                    print(f"img {start + i} {key}: maxdiff="
                          f"{float(d.max()):.6g}")
        # corners masked by valid
        cd = np.abs(batched["corners"][i] - out["corners"])[out["valid"]]
        if cd.size and cd.max() > 1e-3:
            print(f"img {start + i} corners(valid): maxdiff="
                  f"{float(cd.max()):.6g}")
    print("DONE")


if __name__ == "__main__":
    main()
