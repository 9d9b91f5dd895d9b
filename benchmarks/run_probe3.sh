#!/bin/bash
# Third TPU chain: gate the adaptive-CC kernels on hardware, then refresh the
# recall-heavy quality evidence with the convergence fix.
#   nohup bash benchmarks/run_probe3.sh > /tmp/probe3.log 2>&1 & disown
set -x
cd /root/repo
# wait for probe2 to finish (it appends "probe2 done" to its log)
while ! grep -q "probe2 done" /tmp/probe2.log 2>/dev/null; do sleep 30; done

step() { echo "=== [$(date +%T)] $* ==="; }

step tpu kernel tests with adaptive CC
RUN_TPU_TESTS=1 timeout 1800 python -m pytest tests/test_tpu_hardware.py -q \
    > /tmp/tpu_tests2.log 2>&1

step true-OHEM train with checkpoint save
timeout 7200 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir /tmp/hard_bench --out demo/hard_bench/metrics_ohem_none.json \
    --epochs 10 --batch_size 16 --reduction none \
    --save_checkpoint /tmp/hb_models/ohem_none.ckpt

step bf16 scratch re-eval with adaptive CC
timeout 3600 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir /tmp/hard_bench --out demo/hard_bench/metrics_eval_bf16.json \
    --eval_only --checkpoint /tmp/hb_models/hard_bench.ckpt

step probe3 done
