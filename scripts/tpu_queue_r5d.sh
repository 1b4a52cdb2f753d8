#!/usr/bin/env bash
# Round-5 queue D (chains after queue C): retries of disturbed items.
#  - default_tconv4096: the original run hung in remote compile for 50 min
#    (killed; likely disturbed by a second axon client — the backend is
#    single-client) and never produced a record.
# Stop early: touch /tmp/tpu_queue_stop_r5d
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r05.log
STATUS=/tmp/tpu_status_r5d

probe() {
  timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run_item() {
  local name=$1; shift
  [ -f /tmp/tpu_queue_stop_r5d ] && { echo "=== queueD: stop requested" >> "$LOG"; exit 0; }
  echo "=== [$(date -u +%FT%TZ)] START $name: $*" >> "$LOG"
  timeout 7200 env "$@" >> "$LOG" 2>&1
  echo "=== [$(date -u +%FT%TZ)] END $name rc=$?" >> "$LOG"
  echo "$name" > "$STATUS"
}

for _ in $(seq 1 600); do
  [ -f /tmp/tpu_queue_stop_r5d ] && exit 0
  [ "$(cat /tmp/tpu_status_r5c 2>/dev/null)" = "done" ] && break
  sleep 60
done
echo "=== [$(date -u +%FT%TZ)] queueD probing for backend" >> "$LOG"
for _ in $(seq 1 50); do
  [ -f /tmp/tpu_queue_stop_r5d ] && exit 0
  probe && break
  sleep 240
done
probe || { echo "=== queueD: backend never answered" >> "$LOG"; exit 1; }

run_item default_tconv4096_retry MVOC_TCONV_ROWS=4096 python bench.py
echo done > "$STATUS"
echo "=== [$(date -u +%FT%TZ)] queueD COMPLETE" >> "$LOG"
