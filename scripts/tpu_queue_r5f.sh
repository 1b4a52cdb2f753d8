#!/usr/bin/env bash
# Round-5 FINAL-session queue (~50 min of chip budget).
# Targets the two remaining evidence gaps, most valuable first:
#   1. e2e_long64_exact  — BASELINE configs[3]; the one PARTIAL directive.
#      Runtime-OOM fixes (host-side trajectories, a1f2477) landed after
#      the last chip attempt, so this is their first on-chip validation.
#   2. e2e_720p_fast2    — the accelerated suite-resolution e2e
#      (inv5deep-d2 + stage-2 encoder reuse k=3 d2); timed out in its
#      stage-2 compile last session — retries are incremental via the
#      persistent compile cache.
# A watchdog (started alongside) touches the stop file and kills the
# current item before the driver's BENCH needs the chip.
# Stop early: touch /tmp/tpu_queue_stop_r5f
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r05.log
STATUS=/tmp/tpu_status_r5f

probe() { timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

run_retry() { # name attempts timeout_s cmd...
  local name=$1 attempts=$2 tmo=$3; shift 3
  local i rc start
  for i in $(seq 1 "$attempts"); do
    [ -f /tmp/tpu_queue_stop_r5f ] && { echo "=== queueF: stop requested" >> "$LOG"; exit 0; }
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

echo "=== [$(date -u +%FT%TZ)] queueF start" >> "$LOG"
probe || { echo "=== queueF: backend not answering" >> "$LOG"; exit 1; }

run_retry e2e_long64_exact 1 2800 python bench.py --preset e2e --frames 64
run_retry e2e_720p_fast2 1 2400 python bench.py --preset e2e --res 720 --inv_reuse 5 --inv_reuse_deep --reuse_depth 2 --reuse 3
echo done > "$STATUS"
echo "=== [$(date -u +%FT%TZ)] queueF COMPLETE" >> "$LOG"
