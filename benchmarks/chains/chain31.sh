#!/bin/bash
# Round-4 evidence chain v3 (replaces chain30, which ran zero steps inside
# the tunnel outage). One fix vs chain30: step timeouts are CAPPED by the
# time remaining to END_TS, so a step that starts late can never hold the
# chip past the deadline into the driver's bench window (the round-3
# failure mode). Priority order unchanged (VERDICT rank): gate ->
# diag_inproc (#2) -> pruning (#3) -> DCN ablation (#5) -> known-bad-row
# purge (#7) -> warm-start (#6) -> MFU/e2e probes (#10) -> rec stage
# combos (weak #4) -> bench refresh. Writes /tmp/chain31.done when done.
set -x
cd /root/repo

END_TS=1787056500   # ~45 min before round end; driver bench needs the chip

remaining() {
    echo $(( END_TS - $(date +%s) ))
}

past_deadline() {
    [ "$(remaining)" -le 0 ]
}

wait_tpu() {
    while true; do
        if past_deadline; then
            echo "DEADLINE_REACHED_IN_WAIT"
            return 1
        fi
        if timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
            echo "TPU_UP at $(date)"
            return 0
        fi
        sleep 120
    done
}

step() {  # step <timeout_s> <cmd...>
    local t=$1; shift
    local rem
    rem=$(remaining)
    # Cap the step timeout by time-to-deadline; skip if <5 min would remain.
    if [ "$rem" -lt 300 ]; then
        echo "SKIPPING (deadline, rem=$rem): $*"
        return 1
    fi
    if [ "$t" -gt "$rem" ]; then
        t=$rem
    fi
    wait_tpu || return 1
    timeout "$t" "$@"
    local rc=$?
    echo "=== step done rc=$rc: $1 $2 $3 ==="
    return 0
}

# 1. TPU hardware gate: Pallas kernels green on the round-4 tree (ask #9)
step 3600 python tpu_gate.py

# 2. In-process device-eval deficit probe (ask #2)
step 7200 python diag_inproc.py \
    --checkpoint /tmp/hb_models/warm_ctw10.ckpt \
    --data_dir /tmp/hard_bench --steps 1000 \
    --dump_root /tmp/inproc_dumps \
    --out demo/hard_bench/diag_inproc.json

# 3. Pruning measurements (ask #3); hb30_p50.ckpt pre-staged
step 4000 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir /tmp/hard_bench --out demo/hard_bench/metrics_p50_raw.json \
    --eval_only --checkpoint /tmp/hb_models/hb30_p50.ckpt
step 6000 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir /tmp/hard_bench --out /tmp/metrics_p50_ft_train.json \
    --checkpoint /tmp/hb_models/hb30_p50.ckpt \
    --epochs 3 --batch_size 16 --reduction none --lr 0.001 --no_final_eval \
    --save_checkpoint /tmp/hb_models/hb30_p50_ft.ckpt
step 4000 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir /tmp/hard_bench --out demo/hard_bench/metrics_p50_ft.json \
    --eval_only --checkpoint /tmp/hb_models/hb30_p50_ft.ckpt
if ! past_deadline; then
    cp benchmarks/prune_probe.py ./_prune_probe_run.py
    step 4000 python _prune_probe_run.py \
        --checkpoint /tmp/hb_models/hb30.ckpt \
        --out demo/hard_bench/prune_probe.json
    rm -f _prune_probe_run.py
fi

# 4. DCN equal-settings ablation (ask #5): retrain with f32 offsets, fresh
#    eval; baseline row = fresh scratch10 re-eval (also purges its old row)
step 10000 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir /tmp/hard_bench --out /tmp/metrics_dcn_train.json \
    --epochs 10 --batch_size 16 --reduction none --lr 0.005 \
    --backbone deformable_resnet18 --no_final_eval \
    --save_checkpoint /tmp/hb_models/dcn10.ckpt
step 4000 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir /tmp/hard_bench --out demo/hard_bench/metrics_dcn.json \
    --eval_only --checkpoint /tmp/hb_models/dcn10.ckpt \
    --backbone deformable_resnet18
step 4000 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir /tmp/hard_bench --out demo/hard_bench/metrics_scratch10.json \
    --eval_only --checkpoint /tmp/hb_models/scratch10.ckpt

# 5. Purge known-bad rows (ask #7): fresh ohem_mean re-eval
step 4000 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir /tmp/hard_bench --out demo/hard_bench/metrics_ohem_mean.json \
    --eval_only --checkpoint /tmp/hb_models/ohem_mean10.ckpt

# 6. Warm-start evidence (ask #6)
step 4000 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir /tmp/hard_bench --out demo/hard_bench/metrics_warm_ctw_re.json \
    --eval_only --checkpoint /tmp/hb_models/warm_ctw10.ckpt
step 4000 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir /tmp/hard_bench --out /tmp/metrics_scratch3_train.json \
    --epochs 3 --batch_size 16 --reduction none --lr 0.005 --no_final_eval \
    --save_checkpoint /tmp/hb_models/scratch3.ckpt
step 4000 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir /tmp/hard_bench --out demo/hard_bench/metrics_scratch3.json \
    --eval_only --checkpoint /tmp/hb_models/scratch3.ckpt
step 4000 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir /tmp/hard_bench --out /tmp/metrics_warm3_train.json \
    --epochs 3 --batch_size 16 --reduction none --lr 0.005 --no_final_eval \
    --pretrained_backbone /tmp/hb_models/backbone_ctw20.pth \
    --save_checkpoint /tmp/hb_models/warm_ctw3.ckpt
step 4000 python -m db_text_minimal_tpu.cli.quality_bench \
    --data_dir /tmp/hard_bench --out demo/hard_bench/metrics_warm_ctw3.json \
    --eval_only --checkpoint /tmp/hb_models/warm_ctw3.ckpt

# 7. MFU pad probe (ask #10) + e2e boxes probe
if ! past_deadline; then
    cp benchmarks/mfu_pad_probe.py ./_mfu_probe_run.py
    step 4000 python _mfu_probe_run.py --out demo/hard_bench/mfu_pad_probe.json
    rm -f _mfu_probe_run.py
fi
if ! past_deadline; then
    cp benchmarks/e2e_boxes_probe.py ./_e2e_probe_run.py
    step 4000 python _e2e_probe_run.py --batch 32 --steps 10 \
        --out demo/hard_bench/e2e_boxes_probe.json
    rm -f _e2e_probe_run.py
fi

# 8. Recognition stage-combo study (weak #4): TPS+CTC and Attn on the same
#    hard crops, measured on the same hard split
step 6000 python -m db_text_minimal_tpu.cli.train_rec \
    --crop_dir /tmp/hard_crops --epochs 12 --batch_size 32 --lr 1e-3 \
    --Transformation TPS --out /tmp/hb_models/rec_hard_tps.ckpt
step 2400 python -m db_text_minimal_tpu.cli.rec_bench --mode rec \
    --data_dir /tmp/hard_bench --saved_model /tmp/hb_models/rec_hard_tps.ckpt \
    --Transformation TPS --out demo/ocr/rec_accuracy_hard_tps.json
step 6000 python -m db_text_minimal_tpu.cli.train_rec \
    --crop_dir /tmp/hard_crops --epochs 12 --batch_size 32 --lr 1e-3 \
    --Prediction Attn --out /tmp/hb_models/rec_hard_attn.ckpt
step 2400 python -m db_text_minimal_tpu.cli.rec_bench --mode rec \
    --data_dir /tmp/hard_bench --saved_model /tmp/hb_models/rec_hard_attn.ckpt \
    --Prediction Attn --out demo/ocr/rec_accuracy_hard_attn.json

# 9. Refresh BENCH_LASTGOOD on the round-4 tree
step 1800 python bench.py > /tmp/bench_r4_pre.json 2> /tmp/bench_r4_pre.err

touch /tmp/chain31.done
echo "CHAIN31_DONE"
