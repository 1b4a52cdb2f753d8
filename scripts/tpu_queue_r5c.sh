#!/usr/bin/env bash
# Round-5 queue C (chains after queue B): profiling + conditional A/Bs.
#  1. per-op-class roofline budget (VERDICT #3 'or prove it')
#  2. 720p trace (VERDICT weak #7 — where does 720p's MFU go)
#  3. full int8 step through the Pallas s8 GEMM (decided by the probe in
#     queue B; the step number settles it either way)
#  4. 720p capture-reuse k=5 deep row
#  5. long64 accelerated e2e
# Stop early: touch /tmp/tpu_queue_stop_r5c
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r05.log
STATUS=/tmp/tpu_status_r5c

probe() {
  timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run_item() { # name, then full command words
  local name=$1; shift
  [ -f /tmp/tpu_queue_stop_r5c ] && { echo "=== queueC: stop requested" >> "$LOG"; exit 0; }
  echo "=== [$(date -u +%FT%TZ)] START $name: $*" >> "$LOG"
  timeout 7200 env "$@" >> "$LOG" 2>&1
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

run_item roofline_budget python scripts/roofline_budget.py traces/r5_roofline
run_item full720_trace python bench.py --preset full720 --stream --natural --trace traces/r5_720p
run_item int8_pallas_default MVOC_S8_IMPL=pallas python bench.py --int8
run_item full720_capreuse5deep python bench.py --preset full720 --stream --natural --capture_reuse 5 --capture_reuse_deep
run_item e2e_long64_fast python bench.py --preset e2e --frames 64 --inv_reuse 5 --inv_reuse_deep --capture_reuse 5 --capture_reuse_deep
echo done > "$STATUS"
echo "=== [$(date -u +%FT%TZ)] queueC COMPLETE" >> "$LOG"
