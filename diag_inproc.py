"""Discriminating probe: is the device-row deficit triggered by TRAINING
STEPS EXECUTED EARLIER IN THE SAME PROCESS?

Evidence so far: chain12 (2026-08-17, fully serialized — no concurrent TPU
processes) trained warm_ctw10 for 10 epochs and its in-process final eval
still read device rows ~4 F-points below host (metrics_warm_ctw.json:
device DetEval .7766 vs host .8174) — while EVERY fresh eval-only process
measures the same checkpoints at parity (device_parity_r3.json). The
round-3 "concurrent-session corruption" explanation cannot cover a
serialized run; the un-tested confounder is that every clean row came from
a fresh process and every deficit row came from an eval inside a
long-lived training process.

This probe runs, in ONE process, on the SAME checkpoint:

  phase A: resume warm_ctw10 -> full_eval (dump maps+boxes)  -> rows A
  phase B: train --steps optimizer steps (discarding the trained state)
           -> full_eval of the ORIGINAL resumed state (dump)  -> rows B

Phase B evaluates the IDENTICAL model state as phase A, so ANY row
difference is an execution artifact of the process history, not the model.
Afterwards, ``python diag_warm.py <dumpA|dumpB>`` recomputes the device
boxes on CPU from the dumped maps to localize where divergence enters.

Usage (serialized through the TPU chain):

    python diag_inproc.py --checkpoint /tmp/hb_models/warm_ctw10.ckpt \
        --data_dir /tmp/hard_bench --steps 200 \
        --out demo/hard_bench/diag_inproc.json
"""

import argparse
import json
import os
import time

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--data_dir", default="/tmp/hard_bench")
    ap.add_argument("--steps", type=int, default=200,
                    help="optimizer steps to run between the two evals")
    ap.add_argument("--limit_test", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--img_size", type=int, default=640,
                    help="override for small/CPU repro attempts")
    ap.add_argument("--dump_root", default="/tmp/inproc_dumps")
    ap.add_argument("--out", default="demo/hard_bench/diag_inproc.json")
    opt = ap.parse_args()

    from db_text_minimal_tpu.cli.quality_bench import (_limit, build_cfg,
                                                       full_eval, load_args)
    from db_text_minimal_tpu.data.datasets import DataLoader, build_dataset
    from db_text_minimal_tpu.train.trainer import Trainer

    args = load_args(["--data_dir", opt.data_dir, "--eval_only",
                      "--checkpoint", opt.checkpoint,
                      "--batch_size", str(opt.batch_size),
                      "--test_batch_size", str(opt.batch_size),
                      "--img_size", str(opt.img_size),
                      "--out", opt.out])
    cfg = build_cfg(args)
    train_ds = build_dataset(cfg, is_training=True)
    test_ds = _limit(build_dataset(cfg, is_training=False), opt.limit_test)
    train_loader = DataLoader(train_ds, int(cfg.hps.batch_size),
                              shuffle=True)
    test_loader = DataLoader(test_ds, int(cfg.hps.test_batch_size))
    trainer = Trainer(cfg, train_loader, test_loader)
    state = trainer.resume_state(opt.checkpoint)
    # the donated SPMD train step consumes its input state's buffers, so
    # snapshot the resumed params on host before training touches them
    import jax.numpy as jnp

    host_snapshot = jax.device_get(state)

    report = {"checkpoint": opt.checkpoint, "steps_between": opt.steps,
              "backend": jax.default_backend(), "phases": {}}

    def eval_phase(name, eval_state):
        args.dump_eval_dir = os.path.join(opt.dump_root, name)
        t0 = time.perf_counter()
        rows = full_eval(trainer, eval_state, test_loader, args)
        rows["eval_wall_s"] = round(time.perf_counter() - t0, 1)
        rows["device_minus_host_deteval"] = round(
            rows["device"]["deteval"]["hmean"]
            - rows["host"]["deteval"]["hmean"], 4)
        report["phases"][name] = rows
        print(f"== phase {name}:", json.dumps(rows, indent=1), flush=True)

    eval_phase("A_fresh", state)

    # run real optimizer steps (training state is separate from the
    # snapshot; its buffers are donated step to step)
    steps_done = 0
    tstate = state
    epoch = 0
    while steps_done < opt.steps:
        tstate, loss, _, _ = trainer.train_epoch(tstate, epoch)
        steps_done += len(train_ds) // int(cfg.hps.batch_size)
        epoch += 1
        print(f"trained through epoch {epoch}, ~{steps_done} steps, "
              f"loss {loss:.4f}", flush=True)

    # phase B: IDENTICAL params to phase A (re-uploaded from the host
    # snapshot) evaluated after the process has executed training steps —
    # any A-vs-B row difference is an execution artifact of process
    # history, not the model
    state_b = jax.tree.map(jnp.asarray, host_snapshot)
    eval_phase("B_same_params_after_training", state_b)

    # phase C: the TRAINED state, i.e. exactly what an in-process final
    # eval (quality_bench main, chain12) evaluates; the model differs from
    # A/B so only the within-phase device-minus-host delta is the signal
    eval_phase("C_trained_state", tstate)

    a = report["phases"]["A_fresh"]
    b = report["phases"]["B_same_params_after_training"]
    report["delta_device_deteval_hmean_B_vs_A"] = round(
        b["device"]["deteval"]["hmean"] - a["device"]["deteval"]["hmean"], 4)
    report["delta_host_deteval_hmean_B_vs_A"] = round(
        b["host"]["deteval"]["hmean"] - a["host"]["deteval"]["hmean"], 4)
    os.makedirs(os.path.dirname(opt.out) or ".", exist_ok=True)
    with open(opt.out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", opt.out)


if __name__ == "__main__":
    main()
