#!/usr/bin/env bash
# Round-4 third queue: honest-flops re-records for the two presets whose
# earlier recorded JSON lines predate the jaxpr flops walker (full720,
# long64 — steps/s already measured; this refreshes the MFU fields).
# The previous runner died with its session mid-full720.
# Stop early: touch /tmp/tpu_queue_stop6
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r04.log
STATUS=/tmp/tpu_status6

probe() {
  timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run_item() { # name, args...
  local name=$1; shift
  [ -f /tmp/tpu_queue_stop6 ] && { echo "=== queue6: stop requested" >> "$LOG"; exit 0; }
  echo "=== [$(date -u +%FT%TZ)] START $name: bench.py $*" >> "$LOG"
  timeout 7200 python bench.py "$@" >> "$LOG" 2>&1
  echo "=== [$(date -u +%FT%TZ)] END $name rc=$?" >> "$LOG"
}

echo "=== [$(date -u +%FT%TZ)] queue6 probing for backend" >> "$LOG"
for _ in $(seq 1 2000); do
  [ -f /tmp/tpu_queue_stop6 ] && { echo "=== queue6: stop requested" >> "$LOG"; exit 0; }
  probe && break
  sleep 240
done
probe || { echo "=== queue6: backend never answered" >> "$LOG"; exit 1; }

run_item full720_honest --preset full720 --stream --natural
echo done_720 > "$STATUS"
run_item long64_honest  --preset long64
echo done > "$STATUS"
echo "=== [$(date -u +%FT%TZ)] queue6 COMPLETE" >> "$LOG"
