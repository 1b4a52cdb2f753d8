#!/usr/bin/env bash
# Round-5 queue C (chains after queue B): profiling + conditional A/Bs.
# Reordered after the s8-probe compile hang: XLA-only items first; the
# pallas-s8 items run LAST with a 30-min bound each (if the Mosaic s8
# compile hangs again, the loss is bounded and the diagnosis is made).
# Stop early: touch /tmp/tpu_queue_stop_r5c
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r05.log
STATUS=/tmp/tpu_status_r5c

probe() { timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

run_item() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  [ -f /tmp/tpu_queue_stop_r5c ] && { echo "=== queueC: stop requested" >> "$LOG"; exit 0; }
  echo "=== [$(date -u +%FT%TZ)] START $name: $*" >> "$LOG"
  timeout "$tmo" env "$@" >> "$LOG" 2>&1
  echo "=== [$(date -u +%FT%TZ)] END $name rc=$?" >> "$LOG"
  echo "$name" > "$STATUS"
}

for _ in $(seq 1 480); do
  [ -f /tmp/tpu_queue_stop_r5c ] && exit 0
  [ "$(cat /tmp/tpu_status_r5b 2>/dev/null)" = "done" ] && break
  sleep 60
done
echo "=== [$(date -u +%FT%TZ)] queueC probing for backend" >> "$LOG"
for _ in $(seq 1 50); do
  [ -f /tmp/tpu_queue_stop_r5c ] && exit 0
  probe && break
  sleep 240
done
probe || { echo "=== queueC: backend never answered" >> "$LOG"; exit 1; }

run_item roofline_budget 5400 python scripts/roofline_budget.py traces/r5_roofline
run_item full720_trace 5400 python bench.py --preset full720 --stream --natural --trace traces/r5_720p
run_item full720_capreuse5deep 5400 python bench.py --preset full720 --stream --natural --capture_reuse 5 --capture_reuse_deep
run_item e2e_long64_fast 7200 python bench.py --preset e2e --frames 64 --inv_reuse 5 --inv_reuse_deep --capture_reuse 5 --capture_reuse_deep
run_item s8_gemm_probe_retry 1800 python scripts/s8_gemm_probe.py
run_item int8_pallas_default 1800 MVOC_S8_IMPL=pallas python bench.py --int8
echo done > "$STATUS"
echo "=== [$(date -u +%FT%TZ)] queueC COMPLETE" >> "$LOG"
