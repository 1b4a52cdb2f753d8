#!/usr/bin/env bash
# Round-5 queue A: the round-4 measurement debt (VERDICT r4 "Next round" #1).
#  1-3. temporal-conv dispatch rule A/B on the default preset:
#       shipped 2048 vs documented 4096 vs xla control — pick ONE rule.
#  4.   the cut-off e2e_fast5_tconv2048 A/B (completes the e2e triplet:
#       4096 -> 189.97 s, xla -> 187.54 s, 2048 -> ?).
#  5-6. the orphaned honest-MFU re-records (full720, long64) from queue6.
# Stop early: touch /tmp/tpu_queue_stop_r5a
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r05.log
STATUS=/tmp/tpu_status_r5a

probe() {
  timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run_item() { # name, then full command words
  local name=$1; shift
  [ -f /tmp/tpu_queue_stop_r5a ] && { echo "=== queueA: stop requested" >> "$LOG"; exit 0; }
  echo "=== [$(date -u +%FT%TZ)] START $name: $*" >> "$LOG"
  timeout 7200 env "$@" >> "$LOG" 2>&1
  echo "=== [$(date -u +%FT%TZ)] END $name rc=$?" >> "$LOG"
  echo "$name" > "$STATUS"
}

echo "=== [$(date -u +%FT%TZ)] queueA probing for backend" >> "$LOG"
for _ in $(seq 1 80); do
  [ -f /tmp/tpu_queue_stop_r5a ] && exit 0
  probe && break
  sleep 240
done
probe || { echo "=== queueA: backend never answered" >> "$LOG"; exit 1; }

run_item default_tconv2048 python bench.py
run_item default_tconv4096 MVOC_TCONV_ROWS=4096 python bench.py
run_item default_tconvxla  MVOC_TCONV_IMPL=xla python bench.py
run_item e2e_fast5_tconv2048 python bench.py --preset e2e --inv_reuse 5 --inv_reuse_deep --capture_reuse 5 --capture_reuse_deep
run_item full720_honest python bench.py --preset full720 --stream --natural
run_item long64_honest  python bench.py --preset long64
echo done > "$STATUS"
echo "=== [$(date -u +%FT%TZ)] queueA COMPLETE" >> "$LOG"
