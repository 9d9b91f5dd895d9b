#!/bin/bash
# Round-5 tail chain: reprioritized use of the last ~hour of the serialized
# TPU window. Chain50's next queued step was a 4800 s TPS recognizer
# training that could not fit before the derived deadline and would have
# starved both the gate retry (chain51) and the n=400 e2e row; its bash was
# therefore stopped after launching the rec_accuracy_hard_base step, and
# this chain sequences what actually fits, in VERDICT-rank order:
#   wait for the in-flight rec_bench (base stage-combo row) to exit ->
#   release chain51 (tpu_gate retry, ask #8) -> e2e at n=400 (ask #6) ->
#   MFU pad probe (ask #10). Same derived deadline + bench-preemption
#   discipline as chain50/51.
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
    touch /tmp/chain52.done
    echo "CHAIN52_DONE ($1)"
    exit 0
}

# 0. Wait for the orphaned rec_bench (PID in /tmp/recbench.pid) to exit,
#    then release chain51. Its own timeout 1800 bounds it; no TPU probing
#    here — just /proc polling.
REC_PID=$(cat /tmp/recbench.pid)
while [ -d "/proc/$REC_PID" ]; do
    sleep 20
done
echo "rec_bench exited at $(date)"
touch /tmp/chain50.done   # chain51 queues on this

# 1. Wait for chain51 (gate retry) to finish; it honors the same deadline.
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
    if [ "$rem" -lt 300 ]; then
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

# 2. e2e at n=400 (symmetric with the committed zero-shot row, ask #6)
step 2400 $RB --mode e2e --data_dir $HB \
    --det_model_path $M/scratch10.ckpt \
    --saved_model $M/rec_hard_base.ckpt \
    --out demo/ocr/ocr_e2e_hard_r5.json

# 3. MFU pad probe (ask #10)
cp benchmarks/mfu_pad_probe.py ./_mfu_probe_run.py
step 1800 python _mfu_probe_run.py --out demo/hard_bench/mfu_pad_probe.json
rm -f _mfu_probe_run.py

finish "all steps complete"
