#!/bin/bash
# Serial TPU run chain for the round-2 quality/evidence artifacts.
# Run detached from the repo root:
#   nohup bash benchmarks/run_quality_chain.sh > /tmp/chain.log 2>&1 & disown
# Produces:
#   demo/hard_bench/metrics_scratch.json     (10-epoch from-scratch train + dual-path eval)
#   demo/hard_bench/metrics_int8.json        (int8 PTQ eval of the scratch checkpoint)
#   demo/hard_bench/metrics_int8_head.json   (+ quantized fused-head conv1)
#   demo/hard_bench/metrics_warm.json        (warm start from in-tree pretext .pth)
#   demo/hard_bench/metrics_dcn.json         (deformable_resnet18 short run)
#   demo/hard_bench/metrics_fpem.json        (FPEM_FFM neck short run)
#   demo/hard_bench/ohem_probe.json          (true-OHEM vs 'mean' step cost)
set -x
cd /root/repo
DATA=/tmp/hard_bench
OUT=demo/hard_bench
mkdir -p "$OUT" /tmp/hb_models

step() { echo "=== [$(date +%T)] $* ==="; }

step ohem probe
# scripts in subdirs can't import the package (CLAUDE.md) — run a root copy
cp benchmarks/ohem_probe.py /tmp/_ohem_probe_run.py && cp /tmp/_ohem_probe_run.py ./_ohem_probe_run.py
timeout 1200 python _ohem_probe_run.py > "$OUT/ohem_probe.json" 2> /tmp/ohem_probe.err
rm -f _ohem_probe_run.py /tmp/_ohem_probe_run.py

step scratch train
timeout 7200 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir "$DATA" --out "$OUT/metrics_scratch.json" \
    --epochs 10 --batch_size 16 \
    --save_checkpoint /tmp/hb_models/hard_bench.ckpt

step int8 eval
timeout 3600 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir "$DATA" --out "$OUT/metrics_int8.json" \
    --eval_only --checkpoint /tmp/hb_models/hard_bench.ckpt --quant

step int8+head eval
timeout 3600 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir "$DATA" --out "$OUT/metrics_int8_head.json" \
    --eval_only --checkpoint /tmp/hb_models/hard_bench.ckpt --quant --quant_head

step backbone pretext pretrain
timeout 3600 python -m db_text_minimal_tpu.cli.pretrain_backbone \
    --train_dir "$DATA/train_images" --gt_dir "$DATA/train_gts" \
    --out /tmp/hb_models/backbone_pretext.pth

step warm train
timeout 7200 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir "$DATA" --out "$OUT/metrics_warm.json" \
    --epochs 10 --batch_size 16 \
    --pretrained_backbone /tmp/hb_models/backbone_pretext.pth

step dcn short run
timeout 3600 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir "$DATA" --out "$OUT/metrics_dcn.json" \
    --epochs 3 --batch_size 16 --limit_train 480 \
    --backbone deformable_resnet18

step fpem short run
timeout 3600 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir "$DATA" --out "$OUT/metrics_fpem.json" \
    --epochs 3 --batch_size 16 --limit_train 480 \
    --neck FPEM_FFM

step chain done
