"""Per-stage TPU-vs-CPU localization of the device-boxes kernel divergence.

Given image indices with keep/corner flips (from compare_kernel.py diff),
runs each stage of the pipeline on both backends over those maps and
reports the first diverging stage.

    python localize_kernel.py /tmp/hb40_maps_full.npz 12 87 203   # on TPU
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp


def stages(prob_map, max_components=1000):
    """Replicates _device_boxes_single's pipeline, returning per-stage
    arrays (cites ops/pallas/cc.py)."""
    from db_text_minimal_tpu.ops.pallas import cc

    out = {}
    bitmap = (prob_map > jnp.float32(0.25)).astype(jnp.int32)
    out["bitmap"] = bitmap
    labels = cc.connected_components(bitmap)
    out["labels"] = labels
    keyed, valid_root = cc._compact_slots(labels.reshape(-1),
                                          max_components)
    out["keyed"] = keyed
    out["valid_root"] = valid_root
    corners, sides, scores, valid, center, ang = \
        cc.component_rotated_boxes(prob_map, labels,
                                   max_components=max_components,
                                   hole_filled_score=True)
    out["corners"] = corners
    out["sides"] = sides
    out["scores"] = scores
    out["valid"] = valid
    out["ang"] = ang
    keep = valid & (jnp.minimum(sides[:, 0], sides[:, 1]) >= 3) \
        & (scores >= jnp.float32(0.50))
    out["keep"] = keep
    return out


def run(maps, platform):
    dev = jax.devices("cpu")[0] if platform == "cpu" else jax.devices()[0]
    jitted = jax.jit(stages)
    outs = []
    for m in maps:
        x = jax.device_put(jnp.asarray(m), dev)  # committed: jit follows
        outs.append({k: np.asarray(v) for k, v in jitted(x).items()})
    return outs


def main():
    path = sys.argv[1]
    idxs = [int(v) for v in sys.argv[2:]]
    maps = np.load(path)["maps"][..., 0].astype(np.float32)[idxs]
    assert jax.default_backend() not in ("cpu",)
    tpu = run(maps, "tpu")
    cpu = run(maps, "cpu")
    for i, idx in enumerate(idxs):
        print(f"=== img {idx} ===")
        for key in ("bitmap", "labels", "keyed", "valid_root", "scores",
                    "sides", "ang", "corners", "valid", "keep"):
            a, b = tpu[i][key], cpu[i][key]
            if a.dtype == np.bool_ or np.issubdtype(a.dtype, np.integer):
                neq = int((a != b).sum())
                print(f"  {key}: mismatches={neq}")
                if neq and key in ("valid", "keep"):
                    fl = np.where(a != b)[0][:10]
                    print(f"    slots {fl.tolist()}")
            else:
                d = np.abs(a.astype(np.float64) - b.astype(np.float64))
                print(f"  {key}: maxdiff={float(d.max()):.6g}")


if __name__ == "__main__":
    main()
