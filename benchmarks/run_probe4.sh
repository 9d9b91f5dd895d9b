#!/bin/bash
# Fourth TPU chain: 30-epoch headline quality run (true OHEM, best defaults).
#   nohup bash benchmarks/run_probe4.sh > /tmp/probe4.log 2>&1 & disown
set -x
cd /root/repo
while ! grep -q "probe3 done" /tmp/probe3.log 2>/dev/null; do sleep 30; done

timeout 14400 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir /tmp/hard_bench --out demo/hard_bench/metrics_30ep.json \
    --epochs 30 --batch_size 16 --reduction none \
    --save_checkpoint /tmp/hb_models/hb30.ckpt
echo "probe4 done"
