#!/usr/bin/env bash
# Round-5 FINAL queue: ~100 min of chip time left before the 09:45 UTC
# shutdown frees the chip for the driver's BENCH.  Quick cached wins
# first, then the 720p exact e2e under the new compose-first structure
# (incremental retries), then long64 e2e and the 720p rows.
# Stop early: touch /tmp/tpu_queue_stop_r5z  (the 09:45 watchdog does)
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r05.log
STATUS=/tmp/tpu_status_r5z

probe() { timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

run_retry() { # name attempts timeout_s cmd...
  local name=$1 attempts=$2 tmo=$3; shift 3
  local i rc start
  for i in $(seq 1 "$attempts"); do
    [ -f /tmp/tpu_queue_stop_r5z ] && { echo "=== queueZ: stop requested" >> "$LOG"; exit 0; }
    start=$(grep -c "" "$LOG")
    echo "=== [$(date -u +%FT%TZ)] START $name (attempt $i/$attempts, ${tmo}s): $*" >> "$LOG"
    timeout "$tmo" env "$@" >> "$LOG" 2>&1
    rc=$?
    echo "=== [$(date -u +%FT%TZ)] END $name attempt $i rc=$rc" >> "$LOG"
    echo "$name:$i:$rc" > "$STATUS"
    if [ "$rc" -eq 0 ] && tail -n +"$start" "$LOG" | grep -qE '"(metric|classes)"' \
        && ! tail -n +"$start" "$LOG" | grep -qE '"error"|invalid_timing'; then
      return 0
    fi
    if tail -n +"$start" "$LOG" | grep -qE "Ran out of memory in memory space hbm|exit signal SIGKILL"; then
      echo "=== [$(date -u +%FT%TZ)] $name: deterministic failure — no retry" >> "$LOG"
      return 1
    fi
    sleep 20
  done
  return 1
}

echo "=== [$(date -u +%FT%TZ)] queueZ probing for backend" >> "$LOG"
for _ in $(seq 1 20); do
  [ -f /tmp/tpu_queue_stop_r5z ] && exit 0
  probe && break
  sleep 120
done
probe || { echo "=== queueZ: backend never answered" >> "$LOG"; exit 1; }

run_retry default_retry 3 1500 python bench.py
run_retry long64_fguard 2 1500 python bench.py --preset long64
run_retry e2e_fast5_stagekeyed 2 2400 python bench.py --preset e2e --inv_reuse 5 --inv_reuse_deep --capture_reuse 5 --capture_reuse_deep
run_retry e2e_720p_exact 2 3300 python bench.py --preset e2e --res 720
run_retry e2e_long64_exact 2 3000 python bench.py --preset e2e --frames 64
run_retry full720_flashq512 2 1500 MVOC_FLASH_BLOCK_Q=512 python bench.py --preset full720 --stream --natural
run_retry full720_reuse3_depth2 1 1500 python bench.py --preset full720 --stream --natural --reuse 3 --reuse_depth 2
run_retry e2e_720p_fast2 1 2400 python bench.py --preset e2e --res 720 --inv_reuse 5 --inv_reuse_deep --reuse_depth 2 --reuse 3
echo done > "$STATUS"
echo "=== [$(date -u +%FT%TZ)] queueZ COMPLETE" >> "$LOG"
