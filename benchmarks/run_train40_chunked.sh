#!/bin/bash
# 40-epoch poly-decay run as 4 resumable 10-epoch segments — one process per
# segment because the tunneled TPU client retains ~35 MB of upload buffers
# per step (a single 40-epoch process OOM-killed a 128 GB host).
#   nohup bash benchmarks/run_train40_chunked.sh > /tmp/train40c.log 2>&1 & disown
set -x
cd /root/repo
CKPT=/tmp/hb_models/hb40.ckpt
HORIZON=4000   # 40 epochs x 100 steps
for seg in 1 2 3 4; do
    if [ "$seg" = 1 ]; then RESUME=""; else RESUME="--checkpoint $CKPT"; fi
    if [ "$seg" = 4 ]; then EVAL=""; else EVAL="--no_final_eval"; fi
    timeout 7200 python -m db_text_minimal_tpu.cli.quality_bench \
        --data_dir /tmp/hard_bench \
        --out demo/hard_bench/metrics_40ep_poly.json \
        --epochs 10 --batch_size 16 --reduction none \
        --lrs poly --lr 0.007 --lrs_max_iters $HORIZON \
        $RESUME $EVAL --save_checkpoint $CKPT || exit 1
    echo "=== segment $seg done ==="
done
echo "train40 chunked done"
