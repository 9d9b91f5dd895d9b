"""One-process throughput probe: full vs structurally-pruned DBNet.

Loads a trained checkpoint, prunes it at the given operating point
(models/prune.py), and times BOTH models' eval forwards in the same
process (scan-chained jit, median of 3 — the docs/PERFORMANCE.md
methodology; rows are only comparable within one process). Copy to the
repo root before running (PYTHONPATH breaks the axon plugin):

    cp benchmarks/prune_probe.py ./_prune_probe.py
    python _prune_probe.py --checkpoint /tmp/hb_models/hb30.ckpt \
        --out demo/hard_bench/prune_probe.json
"""

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def bench_forward(model, variables, batch: int, steps: int = 20,
                  size: int = 640, repeats: int = 3) -> float:
    @partial(jax.jit, static_argnums=(2,))
    def forward_n(v, x, n):
        def body(carry, _):
            out = model.apply(v, x + carry, train=False)
            return out.mean().astype(jnp.float32), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return s

    x = jnp.asarray(np.random.RandomState(0)
                    .rand(batch, size, size, 3).astype(np.float32))
    float(forward_n(variables, x, steps))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(forward_n(variables, x, steps))
        times.append(time.perf_counter() - t0)
    return batch * steps / sorted(times)[len(times) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="/tmp/hb_models/hb30.ckpt")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--backbone_keep", type=float, default=0.5)
    ap.add_argument("--fpn_inner_keep", type=float, default=0.75)
    ap.add_argument("--fpn_out_keep", type=float, default=0.5)
    ap.add_argument("--out", default="demo/hard_bench/prune_probe.json")
    args = ap.parse_args()

    from db_text_minimal_tpu.models import DBTextModel
    from db_text_minimal_tpu.models.head import fuse_variables
    from db_text_minimal_tpu.models.prune import (prune_dbnet_variables,
                                                  widths_to_model_kwargs)
    from db_text_minimal_tpu.train.checkpoints import load_params_any

    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    variables = jax.device_get(load_params_any(args.checkpoint))
    pruned, widths = prune_dbnet_variables(
        variables, backbone_keep=args.backbone_keep,
        fpn_inner_keep=args.fpn_inner_keep, fpn_out_keep=args.fpn_out_keep)

    full_model = DBTextModel(dtype=dtype, head_name="FusedDBHead")
    full_vars = jax.device_put(fuse_variables(variables))
    pruned_model = DBTextModel(dtype=dtype, head_name="FusedDBHead",
                               **widths_to_model_kwargs(widths))
    pruned_vars = jax.device_put(fuse_variables(pruned))

    full_rate = bench_forward(full_model, full_vars, args.batch,
                              steps=args.steps, size=args.size)
    pruned_rate = bench_forward(pruned_model, pruned_vars, args.batch,
                                steps=args.steps, size=args.size)

    n_full = sum(x.size for x in jax.tree.leaves(variables["params"]))
    n_pruned = sum(x.size for x in jax.tree.leaves(pruned["params"]))
    report = {
        "checkpoint": args.checkpoint,
        "batch": args.batch,
        "keep": {"backbone": args.backbone_keep,
                 "fpn_inner": args.fpn_inner_keep,
                 "fpn_out": args.fpn_out_keep},
        "widths": widths,
        "param_ratio": round(n_pruned / n_full, 4),
        "full_img_s": round(full_rate, 1),
        "pruned_img_s": round(pruned_rate, 1),
        "speedup": round(pruned_rate / full_rate, 4),
        "backend": jax.default_backend(),
    }
    print(json.dumps(report, indent=1))
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
