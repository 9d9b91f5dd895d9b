#!/bin/bash
# Round-5 follow-up: retry the TPU hardware gate (VERDICT r5 ask #8).
# Chain50's gate attempt failed with subprocess.TimeoutExpired at the old
# 600 s per-test cap, 19 min after a tunnel outage ended (first dispatch of
# a new process takes 120-160 s then, compiles 3-5x slow); the per-test cap
# is now 1500 s. Queues behind /tmp/chain50.done so TPU work stays
# serialized, and honors the same derived deadline + bench preemption
# sentinel as chain50.
set -x
cd /root/repo

END_TS=1787124086   # same derivation as chain50: round start 1787098886 + 7h

remaining() { echo $(( END_TS - $(date +%s) )); }
past_deadline() { [ "$(remaining)" -le 0 ]; }

bench_wants_chip() {
    local f=/tmp/BENCH_WANTS_CHIP
    [ -f "$f" ] || return 1
    local age=$(( $(date +%s) - $(stat -c %Y "$f") ))
    [ "$age" -lt 3600 ]
}

finish() {
    touch /tmp/chain51.done
    echo "CHAIN51_DONE ($1)"
    exit 0
}

# queue behind chain50 (its done marker is touched on every exit path)
while [ ! -f /tmp/chain50.done ]; do
    past_deadline && finish "deadline waiting for chain50"
    sleep 60
done

bench_wants_chip && finish "bench preemption"
past_deadline && finish "deadline"
rem=$(remaining)
[ "$rem" -lt 600 ] && finish "deadline (rem=$rem, gate needs >10 min)"

# liveness probe bounded by the same rules (each probe IS a TPU workload)
while true; do
    past_deadline && finish "deadline inside wait_tpu"
    bench_wants_chip && finish "bench preemption inside wait_tpu"
    if timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
        echo "TPU_UP at $(date)"
        break
    fi
    sleep 120
done

t=$(remaining)
[ "$t" -gt 4800 ] && t=4800
timeout "$t" python tpu_gate.py
echo "=== gate retry rc=$? ==="
finish "gate retry complete"
