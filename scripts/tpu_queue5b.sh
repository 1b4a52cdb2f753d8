#!/usr/bin/env bash
# Chained after queue5's early stop (int8 measured a 1.9x LOSS at the real
# workload — remaining int8 rows would waste chip time): the two items that
# still matter, then done.
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r04.log

# wait for queue5's current item to finish (stop flag takes effect between
# items); queue5's pid is in /tmp/tpu_queue5.pid
for _ in $(seq 1 240); do
  kill -0 "$(cat /tmp/tpu_queue5.pid 2>/dev/null)" 2>/dev/null || break
  sleep 30
done

# frame-kernel s_blk=128 re-measure (queue4 datapoint was an invalid
# collapsed timing; bench now floors t_ref at speed-of-light)
echo "=== [$(date -u +%FT%TZ)] START ab_frame_sblk128_retry: MVOC_FRAME_SBLK=128 bench.py" >> "$LOG"
MVOC_FRAME_SBLK=128 timeout 7200 python bench.py >> "$LOG" 2>&1
echo "=== [$(date -u +%FT%TZ)] END ab_frame_sblk128_retry rc=$?" >> "$LOG"

# quality report (CPU-scale; includes the int8 drift rows)
echo "=== [$(date -u +%FT%TZ)] START quality" >> "$LOG"
timeout 7200 python bench.py --preset quality >> "$LOG" 2>&1
echo "=== [$(date -u +%FT%TZ)] END quality rc=$?" >> "$LOG"

echo "=== [$(date -u +%FT%TZ)] queue5b COMPLETE" >> "$LOG"
echo done5b > /tmp/tpu_status5
