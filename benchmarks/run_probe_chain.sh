#!/bin/bash
# Round-2 follow-on TPU chain: waits for the quality chain (if running), then
# serially produces the remaining perf/parity artifacts. Run detached from the
# repo root:
#   nohup bash benchmarks/run_probe_chain.sh > /tmp/probe_chain.log 2>&1 & disown
# Produces:
#   demo/hard_bench/metrics_eval_bf16.json  (bf16 re-eval: device-path cap fix)
#   demo/hard_bench/ohem_probe.json         (sort-free true-OHEM step cost)
#   demo/hard_bench/infer_modes.json        (inference-mode throughput matrix)
#   demo/hard_bench/metrics_ohem_none.json  (true-OHEM 10-epoch training run)
#   /tmp/tpu_tests.log                      (RUN_TPU_TESTS=1 kernel gate)
set -x
cd /root/repo
DATA=/tmp/hard_bench
OUT=demo/hard_bench

step() { echo "=== [$(date +%T)] $* ==="; }

# wait for the quality chain to release the TPU
while [ -f /tmp/chain.pid ] && kill -0 "$(cat /tmp/chain.pid)" 2>/dev/null; do
    sleep 30
done

step bf16 re-eval with device-path cap fix
timeout 3600 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir "$DATA" --out "$OUT/metrics_eval_bf16.json" \
    --eval_only --checkpoint /tmp/hb_models/hard_bench.ckpt

step ohem probe, sort-free bisection top-k
cp benchmarks/ohem_probe.py ./_ohem_probe_run.py
timeout 1200 python _ohem_probe_run.py > "$OUT/ohem_probe.json" 2> /tmp/ohem_probe.err
rm -f _ohem_probe_run.py

step inference mode matrix
cp benchmarks/infer_mode_probe.py ./_infer_mode_run.py
timeout 3600 python _infer_mode_run.py > /tmp/infer_modes.raw 2> /tmp/infer_modes.err
grep -v '^#' /tmp/infer_modes.raw > "$OUT/infer_modes.json"
rm -f _infer_mode_run.py

step tpu hardware kernel tests
RUN_TPU_TESTS=1 timeout 1800 python -m pytest tests/test_tpu_hardware.py -q \
    > /tmp/tpu_tests.log 2>&1

step bench
timeout 1200 python bench.py > /tmp/bench_local.json 2> /tmp/bench_local.err

step true-OHEM training run
timeout 7200 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir "$DATA" --out "$OUT/metrics_ohem_none.json" \
    --epochs 10 --batch_size 16 --reduction none

step probe chain done
