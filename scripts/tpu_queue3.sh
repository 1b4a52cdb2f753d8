#!/usr/bin/env bash
# Round-3 north-star rehearsal (chained after tpu_queue2.sh):
# the strongest measured-honest single-chip e2e — serial inversions
# (measured faster than --batch on one chip) with deep encoder reuse k=3
# on stage 1 + deep capture reuse k=3 on stage 2.  VERDICT r2 directive 6.
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r03.log
STATUS=/tmp/tpu_status

for _ in $(seq 1 2000); do
  [ -f /tmp/tpu_queue_stop ] && { echo "=== queue3: stop requested" >> "$LOG"; exit 0; }
  [ "$(cat "$STATUS" 2>/dev/null)" = done2 ] && break
  sleep 30
done
[ "$(cat "$STATUS" 2>/dev/null)" = done2 ] || { echo "=== queue3: queue2 never finished" >> "$LOG"; exit 1; }

echo "=== [$(date -u +%FT%TZ)] queue3 START (north-star fast e2e)" >> "$LOG"
echo "=== [$(date -u +%FT%TZ)] START e2e_fast_full: e2e inv_reuse3deep capreuse3deep" >> "$LOG"
timeout 3600 python bench.py --preset e2e --inv_reuse 3 --inv_reuse_deep \
  --capture_reuse 3 --capture_reuse_deep >> "$LOG" 2>&1
echo "=== [$(date -u +%FT%TZ)] END e2e_fast_full rc=$?" >> "$LOG"
echo "=== [$(date -u +%FT%TZ)] queue3 COMPLETE" >> "$LOG"
echo done3 > "$STATUS"
