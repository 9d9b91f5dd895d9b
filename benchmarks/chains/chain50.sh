#!/bin/bash
# Round-5 evidence chain. This VM is fresh (no /tmp checkpoints survive
# rounds), so every evidence item regenerates its checkpoint first; the
# hard_bench dataset is bit-identical (seed 7) so rows stay comparable to
# the committed history.
#
# Two fixes vs chain31 (VERDICT r4 weak #1):
#  - END_TS is DERIVED, not guessed: PROGRESS.jsonl's first round-5 entry
#    (ts 1787099621.9, wall_s 736.3) puts round start at 1787098886; the
#    round budget is ~8 h; the driver snapshot + bench need the tail. The
#    chain stops launching TPU work (AND liveness probes — each probe is a
#    TPU workload the bench's serialization gate sees) at start + 7 h.
#  - bench preemption: bench.py now raises /tmp/BENCH_WANTS_CHIP the moment
#    it starts waiting; this chain polls it before every step and inside
#    wait_tpu, and exits (touching its done marker) when raised, so the
#    driver bench preempts the chain instead of waiting out its longest
#    step. Sentinels older than 1 h are stale (crashed bench).
#
# Priority order = VERDICT r5 rank: gate (#8) -> ohem_mean10 retrain (the
# diag subject + ask #7's fresh row) -> diag_inproc (#1) -> scratch10
# (pruning base + DCN baseline) -> pruning block (#3) -> DCN (#4) ->
# warm-start (#5) -> OCR stage matrix + n=400 e2e (#6) -> MFU/e2e probes
# (#10) -> bench refresh. Writes /tmp/chain50.done when done.
set -x
cd /root/repo

END_TS=1787124086   # round start 1787098886 + 7h (derivation above)
M=/tmp/hb_models
mkdir -p $M

remaining() {
    echo $(( END_TS - $(date +%s) ))
}

past_deadline() {
    [ "$(remaining)" -le 0 ]
}

bench_wants_chip() {
    # fresh (<1h) sentinel means the driver bench is waiting for the chip
    local f=/tmp/BENCH_WANTS_CHIP
    [ -f "$f" ] || return 1
    local age=$(( $(date +%s) - $(stat -c %Y "$f") ))
    [ "$age" -lt 3600 ]
}

finish() {
    touch /tmp/chain50.done
    echo "CHAIN50_DONE ($1)"
    exit 0
}

wait_file() {  # wait_file <path> — CPU asset gate, no TPU involved
    while [ ! -f "$1" ]; do
        past_deadline && finish "deadline waiting for $1"
        bench_wants_chip && finish "bench preemption waiting for $1"
        sleep 30
    done
}

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
    # Cap the step timeout by time-to-deadline; skip if <5 min would remain.
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

QB="python -m db_text_minimal_tpu.cli.quality_bench"
HB=/tmp/hard_bench

# 1. TPU hardware gate on the round-5 tree (ask #8; covers the r4
#    4-connected _hole_stats kernel change)
step 2400 python tpu_gate.py

# 2. Retrain ohem_mean10 (subject class KNOWN to show the in-process
#    deficit: r3 measured device .7152 vs host .7533 in-train) + save.
step 3600 $QB --data_dir $HB --out /tmp/m_ohem_mean_train.json \
    --epochs 10 --batch_size 16 --reduction mean --lr 0.005 \
    --no_final_eval --save_checkpoint $M/ohem_mean10.ckpt

# 3. THE headline: in-process device-eval deficit probe (ask #1)
step 7200 python diag_inproc.py \
    --checkpoint $M/ohem_mean10.ckpt \
    --data_dir $HB --steps 1000 \
    --dump_root /tmp/inproc_dumps \
    --out demo/hard_bench/diag_inproc.json

# 4. Fresh eval-only row for ohem_mean (ask #7: replaces the known-bad
#    in-process device row with a fresh-process measurement)
step 2400 $QB --data_dir $HB --out demo/hard_bench/metrics_ohem_mean.json \
    --eval_only --checkpoint $M/ohem_mean10.ckpt

# 5. scratch10 (true OHEM): pruning base + DCN ablation baseline
step 3600 $QB --data_dir $HB --out /tmp/m_scratch10_train.json \
    --epochs 10 --batch_size 16 --reduction none --lr 0.005 \
    --no_final_eval --save_checkpoint $M/scratch10.ckpt
step 2400 $QB --data_dir $HB --out demo/hard_bench/metrics_scratch10.json \
    --eval_only --checkpoint $M/scratch10.ckpt

# 6. Pruning block (ask #3): p50 prune -> raw row -> 3-epoch fine-tune ->
#    recovery row -> one-process full-vs-pruned throughput probe
JAX_PLATFORMS=cpu python -m db_text_minimal_tpu.cli.prune \
    --checkpoint $M/scratch10.ckpt --out $M/s10_p50.ckpt \
    --backbone_keep 0.5 --fpn_inner_keep 0.75 --fpn_out_keep 0.5
step 2400 $QB --data_dir $HB --out demo/hard_bench/metrics_p50_raw.json \
    --eval_only --checkpoint $M/s10_p50.ckpt
step 3000 $QB --data_dir $HB --out /tmp/m_p50_ft_train.json \
    --checkpoint $M/s10_p50.ckpt \
    --epochs 3 --batch_size 16 --reduction none --lr 0.001 --no_final_eval \
    --save_checkpoint $M/s10_p50_ft.ckpt
step 2400 $QB --data_dir $HB --out demo/hard_bench/metrics_p50_ft.json \
    --eval_only --checkpoint $M/s10_p50_ft.ckpt
cp benchmarks/prune_probe.py ./_prune_probe_run.py
step 2400 python _prune_probe_run.py --checkpoint $M/scratch10.ckpt \
    --out demo/hard_bench/prune_probe.json
rm -f _prune_probe_run.py

# 7. DCN equal-settings ablation post f32-offset fix (ask #4); baseline =
#    metrics_scratch10.json from step 5
step 7200 $QB --data_dir $HB --out /tmp/m_dcn_train.json \
    --epochs 10 --batch_size 16 --reduction none --lr 0.005 \
    --backbone deformable_resnet18 --no_final_eval \
    --save_checkpoint $M/dcn10.ckpt
step 2400 $QB --data_dir $HB --out demo/hard_bench/metrics_dcn.json \
    --eval_only --checkpoint $M/dcn10.ckpt \
    --backbone deformable_resnet18

# 8. Warm-start 3-epoch comparison (ask #5): ctw20 pretrain -> backbone
#    .pth export -> scratch3 vs warm_ctw3
wait_file /tmp/cpu_assets.done
step 7200 $QB --data_dir /tmp/ctw_bench --dataset_format ctw1500 \
    --out /tmp/m_ctw20_train.json \
    --epochs 20 --batch_size 16 --reduction none --lr 0.005 \
    --no_final_eval --save_checkpoint $M/ctw20.ckpt
cp benchmarks/export_backbone.py ./_export_backbone_run.py
JAX_PLATFORMS=cpu python _export_backbone_run.py \
    --checkpoint $M/ctw20.ckpt --out $M/backbone_ctw20.pth
rm -f _export_backbone_run.py
step 2400 $QB --data_dir $HB --out /tmp/m_scratch3_train.json \
    --epochs 3 --batch_size 16 --reduction none --lr 0.005 --no_final_eval \
    --save_checkpoint $M/scratch3.ckpt
step 2400 $QB --data_dir $HB --out demo/hard_bench/metrics_scratch3.json \
    --eval_only --checkpoint $M/scratch3.ckpt
step 2400 $QB --data_dir $HB --out /tmp/m_warm3_train.json \
    --epochs 3 --batch_size 16 --reduction none --lr 0.005 --no_final_eval \
    --pretrained_backbone $M/backbone_ctw20.pth \
    --save_checkpoint $M/warm_ctw3.ckpt
step 2400 $QB --data_dir $HB --out demo/hard_bench/metrics_warm_ctw3.json \
    --eval_only --checkpoint $M/warm_ctw3.ckpt

# 9. OCR stage-combo matrix on the hard crops (ask #6): base CTC, TPS+CTC,
#    Attn — each trained 12 epochs on the 22.8k GT crops, word accuracy
#    measured on the held-out split of the same data_dir
RB="python -m db_text_minimal_tpu.cli.rec_bench"
TR="python -m db_text_minimal_tpu.cli.train_rec"
step 4800 $TR --crop_dir /tmp/hard_crops --epochs 12 --batch_size 32 \
    --lr 1e-3 --out $M/rec_hard_base.ckpt
step 1800 $RB --mode rec --data_dir $HB --saved_model $M/rec_hard_base.ckpt \
    --out demo/ocr/rec_accuracy_hard_base.json
step 4800 $TR --crop_dir /tmp/hard_crops --epochs 12 --batch_size 32 \
    --lr 1e-3 --Transformation TPS --out $M/rec_hard_tps.ckpt
step 1800 $RB --mode rec --data_dir $HB --saved_model $M/rec_hard_tps.ckpt \
    --Transformation TPS --out demo/ocr/rec_accuracy_hard_tps.json
step 4800 $TR --crop_dir /tmp/hard_crops --epochs 12 --batch_size 32 \
    --lr 1e-3 --Prediction Attn --out $M/rec_hard_attn.ckpt
step 1800 $RB --mode rec --data_dir $HB --saved_model $M/rec_hard_attn.ckpt \
    --Prediction Attn --out demo/ocr/rec_accuracy_hard_attn.json

# 10. e2e at n=400 (symmetric with the committed zero-shot row, ask #6)
step 3600 $RB --mode e2e --data_dir $HB \
    --det_model_path $M/scratch10.ckpt \
    --saved_model $M/rec_hard_base.ckpt \
    --out demo/ocr/ocr_e2e_hard_r5.json

# 11. MFU pad probe + e2e boxes probe (ask #10)
cp benchmarks/mfu_pad_probe.py ./_mfu_probe_run.py
step 2400 python _mfu_probe_run.py --out demo/hard_bench/mfu_pad_probe.json
rm -f _mfu_probe_run.py
cp benchmarks/e2e_boxes_probe.py ./_e2e_probe_run.py
step 2400 python _e2e_probe_run.py --batch 32 --steps 10 \
    --out demo/hard_bench/e2e_boxes_probe.json
rm -f _e2e_probe_run.py

# 12. Refresh BENCH_LASTGOOD on the round-5 tree
step 1800 python bench.py > /tmp/bench_r5_pre.json 2> /tmp/bench_r5_pre.err

finish "all steps complete"
