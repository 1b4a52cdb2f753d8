#!/usr/bin/env bash
# TPU measurement queue runner (round 3).
#
# The axon TPU tunnel goes down for hours at a time (round-2 outage cost the
# round every hardware number — VERDICT.md "What's missing" #1).  This script
# probes the backend on a loop and, the moment it answers, runs the pending
# measurement queue sequentially, appending one line per result to the log.
#
# Usage: nohup bash scripts/tpu_queue.sh >/dev/null 2>&1 &
# Log:   /root/repo/TPU_RUNS_r03.log   (JSON lines + rc markers)
# Stop:  touch /tmp/tpu_queue_stop
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r03.log
STATUS=/tmp/tpu_status
probe() {
  timeout 90 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform != "cpu"
EOF
}

run_item() {
  local name="$1"; shift
  echo "=== [$(date -u +%FT%TZ)] START $name: $*" >> "$LOG"
  timeout "$ITEM_TIMEOUT" env "${ENVV[@]}" python "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== [$(date -u +%FT%TZ)] END $name rc=$rc" >> "$LOG"
  return $rc
}

echo "=== [$(date -u +%FT%TZ)] queue runner started (pid $$)" >> "$LOG"
while true; do
  [ -f /tmp/tpu_queue_stop ] && { echo "=== stop requested" >> "$LOG"; exit 0; }
  if probe; then
    echo up > "$STATUS"
    break
  fi
  echo down > "$STATUS"
  sleep 240
done
echo "=== [$(date -u +%FT%TZ)] TPU UP — running queue" >> "$LOG"

ENVV=()
ITEM_TIMEOUT=2400
# 1. default bench (stream+natural + cross-attn flash + frame kernel) — warms
#    the compile cache for the driver's BENCH run
run_item default bench.py
# 2. capture reuse (expected strongest numbers)
run_item capreuse3 bench.py --capture_reuse 3
run_item capreuse3deep bench.py --capture_reuse 3 --capture_reuse_deep
# 3. 720p stream
run_item full720 bench.py --preset full720 --stream --natural
# 4. batched e2e (single chip) — the north-star rehearsal
ITEM_TIMEOUT=3600
run_item e2e_batch bench.py --preset e2e --batch
run_item e2e_batch_fast bench.py --preset e2e --batch --capture_reuse 3 --capture_reuse_deep
ITEM_TIMEOUT=2400
# 5. frame-kernel fold A/B
ENVV=(MVOC_FRAME_ATTN_FOLD=2)
run_item fold2_512 bench.py
run_item fold2_720 bench.py --preset full720 --stream --natural
ENVV=()
# 6. long64 re-measure (frame kernel now serves the windowed path)
run_item long64 bench.py --preset long64 --stream --natural

echo "=== [$(date -u +%FT%TZ)] queue COMPLETE" >> "$LOG"
echo done > "$STATUS"
