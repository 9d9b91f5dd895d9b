#!/bin/bash
# Clean inference-mode ablation (deconv_d2s off by default) — waits for the
# first probe chain, then re-runs the mode matrix.
#   nohup bash benchmarks/run_probe2.sh > /tmp/probe2.log 2>&1 & disown
set -x
cd /root/repo
while [ -f /tmp/probe_chain.pid ] && kill -0 "$(cat /tmp/probe_chain.pid)" 2>/dev/null; do
    sleep 30
done
cp benchmarks/infer_mode_probe.py ./_infer_mode_run2.py
timeout 3600 python _infer_mode_run2.py > /tmp/infer_modes2.raw 2> /tmp/infer_modes2.err
grep -v '^#' /tmp/infer_modes2.raw > demo/hard_bench/infer_modes.json
rm -f _infer_mode_run2.py
echo "probe2 done"
