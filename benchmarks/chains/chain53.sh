#!/bin/bash
# Round-5 final chain: the OCR stage-combo matrix + n=400 e2e (VERDICT ask
# #6) on the batched recognition eval (commit 898a95c) — the per-crop RPC
# cost that killed chain50's base-row eval at its 1800 s cap is gone, so
# each rec row now fits in minutes and the remaining window can hold the
# matrix. Queues behind chain51 (tpu_gate retry); same derived deadline +
# bench-preemption discipline as chain50/51/52. Steps are ordered by
# VERDICT value so the deadline guillotine cuts the least important tail:
# base row -> TPS train+row -> e2e n=400 -> Attn train+row -> MFU probe.
set -x
cd /root/repo

END_TS=1787124086   # round start 1787098886 + 7h (same derivation as chain50)
M=/tmp/hb_models
HB=/tmp/hard_bench

remaining() { echo $(( END_TS - $(date +%s) )); }
past_deadline() { [ "$(remaining)" -le 0 ]; }

bench_wants_chip() {
    local f=/tmp/BENCH_WANTS_CHIP
    [ -f "$f" ] || return 1
    local age=$(( $(date +%s) - $(stat -c %Y "$f") ))
    [ "$age" -lt 3600 ]
}

finish() {
    touch /tmp/chain53.done
    echo "CHAIN53_DONE ($1)"
    exit 0
}

# queue behind the gate retry
while [ ! -f /tmp/chain51.done ]; do
    past_deadline && finish "deadline waiting for chain51"
    sleep 30
done

wait_tpu() {
    while true; do
        past_deadline && return 1
        bench_wants_chip && return 1
        if timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
            echo "TPU_UP at $(date)"
            return 0
        fi
        sleep 120
    done
}

step() {  # step <timeout_s> <cmd...>
    local t=$1; shift
    bench_wants_chip && finish "bench preemption"
    past_deadline && finish "deadline"
    local rem
    rem=$(remaining)
    if [ "$rem" -lt 240 ]; then
        finish "deadline (rem=$rem before: $*)"
    fi
    if [ "$t" -gt "$rem" ]; then
        t=$rem
    fi
    if ! wait_tpu; then
        finish "deadline/preemption inside wait_tpu before: $*"
    fi
    timeout "$t" "$@"
    local rc=$?
    echo "=== step done rc=$rc: $1 $2 $3 ==="
    return 0
}

RB="python -m db_text_minimal_tpu.cli.rec_bench"
TR="python -m db_text_minimal_tpu.cli.train_rec"

# 1. base stage-combo row (None/VGG/BiLSTM/CTC), batched eval
step 900 $RB --mode rec --data_dir $HB --saved_model $M/rec_hard_base.ckpt \
    --out demo/ocr/rec_accuracy_hard_base.json

# 2. TPS axis: train + row
step 900 $TR --crop_dir /tmp/hard_crops --epochs 12 --batch_size 32 \
    --lr 1e-3 --Transformation TPS --out $M/rec_hard_tps.ckpt
step 900 $RB --mode rec --data_dir $HB --saved_model $M/rec_hard_tps.ckpt \
    --Transformation TPS --out demo/ocr/rec_accuracy_hard_tps.json

# 3. e2e at n=400, symmetric with the committed zero-shot row
step 1500 $RB --mode e2e --data_dir $HB \
    --det_model_path $M/scratch10.ckpt \
    --saved_model $M/rec_hard_base.ckpt \
    --out demo/ocr/ocr_e2e_hard_r5.json

# 4. Attn axis: train + row
step 900 $TR --crop_dir /tmp/hard_crops --epochs 12 --batch_size 32 \
    --lr 1e-3 --Prediction Attn --out $M/rec_hard_attn.ckpt
step 900 $RB --mode rec --data_dir $HB --saved_model $M/rec_hard_attn.ckpt \
    --Prediction Attn --out demo/ocr/rec_accuracy_hard_attn.json

# 5. MFU pad probe (ask #10)
cp benchmarks/mfu_pad_probe.py ./_mfu_probe_run.py
step 900 python _mfu_probe_run.py --out demo/hard_bench/mfu_pad_probe.json
rm -f _mfu_probe_run.py

finish "all steps complete"
