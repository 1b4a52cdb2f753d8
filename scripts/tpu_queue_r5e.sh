#!/usr/bin/env bash
# Round-5 queue E (chains after queue D2): re-records after the F<=16
# temporal-conv guard (long64 should return to ~0.185 with honest MFU).
# Stop early: touch /tmp/tpu_queue_stop_r5e
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r05.log
STATUS=/tmp/tpu_status_r5e

probe() { timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

run_item() {
  local name=$1; shift
  [ -f /tmp/tpu_queue_stop_r5e ] && { echo "=== queueE: stop requested" >> "$LOG"; exit 0; }
  echo "=== [$(date -u +%FT%TZ)] START $name: $*" >> "$LOG"
  timeout 7200 env "$@" >> "$LOG" 2>&1
  echo "=== [$(date -u +%FT%TZ)] END $name rc=$?" >> "$LOG"
  echo "$name" > "$STATUS"
}

for _ in $(seq 1 720); do
  [ -f /tmp/tpu_queue_stop_r5e ] && exit 0
  [ "$(cat /tmp/tpu_status_r5d2 2>/dev/null)" = "done" ] && break
  sleep 60
done
echo "=== [$(date -u +%FT%TZ)] queueE probing for backend" >> "$LOG"
for _ in $(seq 1 50); do
  [ -f /tmp/tpu_queue_stop_r5e ] && exit 0
  probe && break
  sleep 240
done
probe || { echo "=== queueE: backend never answered" >> "$LOG"; exit 1; }

run_item long64_fguard python bench.py --preset long64
echo done > "$STATUS"
echo "=== [$(date -u +%FT%TZ)] queueE COMPLETE" >> "$LOG"
