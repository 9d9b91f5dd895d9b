#!/bin/bash
# CPU fallback for VERDICT ask #3 (pruning quality rows) in case the tunnel
# outage persists to round end. Same-platform delta: full hb30 vs pruned p50,
# both CPU f32, host representer, limit_test=100 (same subset size as the
# OCR e2e rows). Runs nice-19 and aborts between steps the moment chain31
# reports TPU_UP, so it never starves a real TPU job's loader threads.
set -x
cd /root/repo

tpu_busy() {
    grep -q "TPU_UP" /tmp/chain31.log 2>/dev/null
}

run_eval() {  # run_eval <ckpt> <out>
    if tpu_busy; then echo "ABORT: chain31 has the chip"; exit 0; fi
    nice -n 19 timeout 5400 python -m db_text_minimal_tpu.cli.quality_bench \
        --data_dir /tmp/hard_bench --out "$2" \
        --eval_only --checkpoint "$1" --limit_test 100
    echo "=== cpu eval done rc=$?: $2 ==="
}

export JAX_PLATFORMS=cpu
run_eval /tmp/hb_models/hb30.ckpt     demo/hard_bench/metrics_30ep_cpu100.json
run_eval /tmp/hb_models/hb30_p50.ckpt demo/hard_bench/metrics_p50_raw_cpu100.json
run_eval /tmp/hb_models/hb30_p75.ckpt demo/hard_bench/metrics_p75_raw_cpu100.json
run_eval /tmp/hb_models/hb30_p90.ckpt demo/hard_bench/metrics_p90_raw_cpu100.json
touch /tmp/cpu_fallback2.done
echo "CPU_FALLBACK2_DONE"
