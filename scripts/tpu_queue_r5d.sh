#!/usr/bin/env bash
# Round-5 queue D (chains after queue C): stage-keyed dispatch confirmation.
#  - e2e fast5 with the stage-keyed temporal-conv rule (inversion traces on
#    XLA, composite on stack3@4096): the r5 stage breakdowns project
#    ~187.1 s (invert 164.9 + compose 22.24) — confirm on hardware.
#  - default-preset confirmation rides queue B's default_retry (same code).
# Stop early: touch /tmp/tpu_queue_stop_r5d2
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r05.log
STATUS=/tmp/tpu_status_r5d2

probe() {
  timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run_item() {
  local name=$1; shift
  [ -f /tmp/tpu_queue_stop_r5d2 ] && { echo "=== queueD2: stop requested" >> "$LOG"; exit 0; }
  echo "=== [$(date -u +%FT%TZ)] START $name: $*" >> "$LOG"
  timeout 7200 env "$@" >> "$LOG" 2>&1
  echo "=== [$(date -u +%FT%TZ)] END $name rc=$?" >> "$LOG"
  echo "$name" > "$STATUS"
}

for _ in $(seq 1 600); do
  [ -f /tmp/tpu_queue_stop_r5d2 ] && exit 0
  [ "$(cat /tmp/tpu_status_r5c 2>/dev/null)" = "done" ] && break
  sleep 60
done
echo "=== [$(date -u +%FT%TZ)] queueD2 probing for backend" >> "$LOG"
for _ in $(seq 1 50); do
  [ -f /tmp/tpu_queue_stop_r5d2 ] && exit 0
  probe && break
  sleep 240
done
probe || { echo "=== queueD2: backend never answered" >> "$LOG"; exit 1; }

run_item e2e_fast5_stagekeyed python bench.py --preset e2e --inv_reuse 5 --inv_reuse_deep --capture_reuse 5 --capture_reuse_deep
echo done > "$STATUS"
echo "=== [$(date -u +%FT%TZ)] queueD2 COMPLETE" >> "$LOG"
