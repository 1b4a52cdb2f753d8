#!/usr/bin/env bash
# Round-5 queue N (chains after the master queue): 720p flash-block A/B.
# The analytic mix decomposition (ROUND_NOTES r5) puts 27% of 720p flops
# in the flash kernel at ~55 TF/s; _pick_block lands on MXU-misaligned
# divisors (q=480, k=960) at seq 14400.  A/B the padded aligned blocks.
# Stop early: touch /tmp/tpu_queue_stop_r5n
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r05.log
STATUS=/tmp/tpu_status_r5n

probe() { timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

run_retry() { # name attempts timeout_s cmd...
  local name=$1 attempts=$2 tmo=$3; shift 3
  local i rc
  for i in $(seq 1 "$attempts"); do
    [ -f /tmp/tpu_queue_stop_r5n ] && { echo "=== queueN: stop requested" >> "$LOG"; exit 0; }
    echo "=== [$(date -u +%FT%TZ)] START $name (attempt $i/$attempts, ${tmo}s): $*" >> "$LOG"
    timeout "$tmo" env "$@" >> "$LOG" 2>&1
    rc=$?
    echo "=== [$(date -u +%FT%TZ)] END $name attempt $i rc=$rc" >> "$LOG"
    echo "$name:$i:$rc" > "$STATUS"
    if [ "$rc" -eq 0 ] && tail -40 "$LOG" | grep -qE '"metric"' \
        && ! tail -40 "$LOG" | grep -qE '"error"|invalid_timing'; then
      return 0
    fi
    sleep 30
  done
  return 1
}

for _ in $(seq 1 720); do
  [ -f /tmp/tpu_queue_stop_r5n ] && exit 0
  [ "$(cat /tmp/tpu_status_r5m 2>/dev/null)" = "done" ] && break
  sleep 60
done
echo "=== [$(date -u +%FT%TZ)] queueN probing for backend" >> "$LOG"
for _ in $(seq 1 50); do
  [ -f /tmp/tpu_queue_stop_r5n ] && exit 0
  probe && break
  sleep 240
done
probe || { echo "=== queueN: backend never answered" >> "$LOG"; exit 1; }

run_retry full720_flashq512 3 1800 MVOC_FLASH_BLOCK_Q=512 python bench.py --preset full720 --stream --natural
run_retry full720_flashq512k1024 3 1800 MVOC_FLASH_BLOCK_Q=512 MVOC_FLASH_BLOCK_K=1024 python bench.py --preset full720 --stream --natural
echo done > "$STATUS"
echo "=== [$(date -u +%FT%TZ)] queueN COMPLETE" >> "$LOG"
