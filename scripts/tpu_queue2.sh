#!/usr/bin/env bash
# Round-3 follow-up TPU runs: chained after scripts/tpu_queue.sh completes.
#
# 1. Re-measure the default bench with the round-3 GroupNorm (two-pass
#    centered variance) — the A/B against the 0.8755 steps/s recorded with
#    the one-pass form, and the compile-cache warm for the driver's BENCH.
# 2. Capture a profiler trace of the default step and log the device-op
#    breakdown — the input for this round's profile-guided optimization.
#
# Usage: nohup bash scripts/tpu_queue2.sh >/dev/null 2>&1 &
# Stop:  touch /tmp/tpu_queue_stop
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r03.log
STATUS=/tmp/tpu_status

run_item() {
  local name="$1"; shift
  echo "=== [$(date -u +%FT%TZ)] START $name: $*" >> "$LOG"
  timeout "$ITEM_TIMEOUT" python "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== [$(date -u +%FT%TZ)] END $name rc=$rc" >> "$LOG"
  return $rc
}

# wait for the primary queue to finish (status file says done), bounded
for _ in $(seq 1 2000); do
  [ -f /tmp/tpu_queue_stop ] && { echo "=== queue2: stop requested" >> "$LOG"; exit 0; }
  [ "$(cat "$STATUS" 2>/dev/null)" = done ] && break
  sleep 30
done
[ "$(cat "$STATUS" 2>/dev/null)" = done ] || { echo "=== queue2: primary never finished" >> "$LOG"; exit 1; }

echo "=== [$(date -u +%FT%TZ)] queue2 START (GroupNorm A/B + trace)" >> "$LOG"
ITEM_TIMEOUT=2400
run_item gn2pass_default bench.py
run_item trace_default bench.py --iters 6 --trace /root/repo/traces/r3_default
echo "=== [$(date -u +%FT%TZ)] queue2 COMPLETE" >> "$LOG"
echo done2 > "$STATUS"
