"""MFU-headroom probe: can MXU-lane padding of the narrow backbone convs
raise the 640² bf16 inference headline? (VERDICT r3 ask #10.)

docs/PERFORMANCE.md pins the 23 %-of-peak ceiling on (a) the 64-channel
stem/layer1 convs half-filling the 128-wide MXU and (b) the FPN output
conv (3×3 256→256 @160², ~30 GFLOPs/img — larger than the whole backbone).
This probe measures, in ONE process (tunnel session variance is ±6 %
across processes, so only within-process rows are comparable):

1. ``default``      — the shipped bf16 FusedDBHead model (bench.py config).
2. ``pad_layer1``   — WEIGHT-EQUIVALENT zero-padding of layer1's two
   block-internal hidden widths 64→128 (conv1 out / bn1 / conv2 in). If
   64-ch convs waste half the MXU lanes this is free FLOP headroom; if wall
   time grows ∝ FLOPs, XLA was already packing the narrow convs and the
   ceiling is architectural.
3. ``fpn_out_128``  — NON-PARITY DIAGNOSTIC: the FPN output conv + head
   input halved to 128 channels (random weights — throughput only). Bounds
   what an architecture change (forbidden for parity) would buy, i.e.
   documents how much of the remaining time the one conv owns.

Run from the repo root (CLAUDE.md: PYTHONPATH breaks the axon plugin):
    python _mfu_probe_run.py --out demo/hard_bench/mfu_pad_probe.json
"""

import argparse
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def pad_layer1_variables(variables, pad_to=128):
    """Zero-pad layer1 BasicBlocks' hidden width 64→pad_to, exactly
    weight-equivalent: extra conv1 output channels are all-zero, their BN
    is identity (scale 1, bias 0, mean 0, var 1 → output 0 → relu 0), and
    conv2 consumes them with all-zero input slices."""
    import copy

    v = copy.deepcopy(jax.device_get(variables))
    for blk in ("layer1_0", "layer1_1"):
        p = v["params"]["backbone"][blk]
        s = v["batch_stats"]["backbone"][blk] if "batch_stats" in v else None
        k1 = np.asarray(p["conv1"]["kernel"])
        old = k1.shape[-1]
        extra = pad_to - old
        p["conv1"]["kernel"] = np.concatenate(
            [k1, np.zeros(k1.shape[:-1] + (extra,), k1.dtype)], axis=-1)
        bn = p["bn1"]
        bn["scale"] = np.concatenate(
            [np.asarray(bn["scale"]), np.ones(extra, np.float32)])
        bn["bias"] = np.concatenate(
            [np.asarray(bn["bias"]), np.zeros(extra, np.float32)])
        if s is not None:
            s["bn1"]["mean"] = np.concatenate(
                [np.asarray(s["bn1"]["mean"]), np.zeros(extra, np.float32)])
            s["bn1"]["var"] = np.concatenate(
                [np.asarray(s["bn1"]["var"]), np.ones(extra, np.float32)])
        k2 = np.asarray(p["conv2"]["kernel"])
        p["conv2"]["kernel"] = np.concatenate(
            [k2, np.zeros(k2.shape[:2] + (extra,) + k2.shape[3:], k2.dtype)],
            axis=2)
    return v


def timed_throughput(model, variables, batch_size=32, size=640, steps=20,
                     repeats=3):
    @partial(jax.jit, static_argnums=(2,))
    def forward_n(v, x, n):
        def body(carry, _):
            out = model.apply(v, x + carry, train=False)
            return out.mean().astype(jnp.float32), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return s

    x = jnp.asarray(np.random.RandomState(0)
                    .rand(batch_size, size, size, 3).astype(np.float32))
    float(forward_n(variables, x, steps))  # compile + warm
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(forward_n(variables, x, steps))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return batch_size * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="demo/hard_bench/mfu_pad_probe.json")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--size", type=int, default=640)
    opt = ap.parse_args()

    from db_text_minimal_tpu.models import DBTextModel
    from db_text_minimal_tpu.models.head import fuse_variables

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    base = DBTextModel(dtype=dtype)
    variables = fuse_variables(base.init(
        jax.random.PRNGKey(0), jnp.zeros((1, opt.size, opt.size, 3)),
        train=False))
    fused = DBTextModel(dtype=dtype, head_name="FusedDBHead")

    report = {"batch": opt.batch, "steps": opt.steps, "size": opt.size,
              "backend": jax.default_backend(), "rows": {}}

    # equivalence check for the padded transform (small input, f32 exact)
    base32 = DBTextModel(dtype=jnp.float32, head_name="FusedDBHead")
    pad32 = DBTextModel(dtype=jnp.float32, head_name="FusedDBHead",
                        backbone_hidden=(128, 128, 0, 0, 0, 0, 0, 0))
    v32 = jax.device_get(variables)
    xs = jnp.asarray(np.random.RandomState(1)
                     .rand(1, 160, 160, 3).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        ref = base32.apply(v32, xs, train=False)
        got = pad32.apply(pad_layer1_variables(v32), xs, train=False)
    report["pad_equivalence_max_abs"] = float(
        jnp.max(jnp.abs(ref - got)))

    report["rows"]["default"] = round(timed_throughput(
        fused, variables, opt.batch, opt.size, opt.steps), 2)

    padded_model = DBTextModel(dtype=dtype, head_name="FusedDBHead",
                               backbone_hidden=(128, 128, 0, 0, 0, 0, 0, 0))
    padded_vars = jax.device_put(pad_layer1_variables(variables))
    report["rows"]["pad_layer1"] = round(timed_throughput(
        padded_model, padded_vars, opt.batch, opt.size, opt.steps), 2)

    # non-parity diagnostic: FPN out + head input at 128 channels
    slim_base = DBTextModel(dtype=dtype, fpn_out=128, head_width=64)
    slim_vars = fuse_variables(slim_base.init(
        jax.random.PRNGKey(2), jnp.zeros((1, opt.size, opt.size, 3)),
        train=False))
    slim = DBTextModel(dtype=dtype, head_name="FusedDBHead", fpn_out=128,
                       head_width=64)
    report["rows"]["fpn_out_128_nonparity"] = round(timed_throughput(
        slim, slim_vars, opt.batch, opt.size, opt.steps), 2)

    print(json.dumps(report, indent=1))
    with open(opt.out, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
