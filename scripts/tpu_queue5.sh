#!/usr/bin/env bash
# Round-4 second measurement queue: int8 w8a8 decision + honest-MFU
# re-record + the frame-kernel s_blk re-measure (its queue4 datapoint was
# an invalid collapsed timing; bench now floors t_ref at speed-of-light).
#
# Run AFTER the QuantConv swap + bench flops/emit changes are committed.
# Stop early: touch /tmp/tpu_queue_stop5
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r04.log
STATUS=/tmp/tpu_status5

probe() {
  timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run_item() { # name, args...
  local name=$1; shift
  [ -f /tmp/tpu_queue_stop5 ] && { echo "=== queue5: stop requested" >> "$LOG"; exit 0; }
  echo "=== [$(date -u +%FT%TZ)] START $name: bench.py $*" >> "$LOG"
  timeout 7200 python bench.py "$@" >> "$LOG" 2>&1
  echo "=== [$(date -u +%FT%TZ)] END $name rc=$?" >> "$LOG"
}

echo "=== [$(date -u +%FT%TZ)] queue5 probing for backend" >> "$LOG"
for _ in $(seq 1 2000); do
  [ -f /tmp/tpu_queue_stop5 ] && { echo "=== queue5: stop requested" >> "$LOG"; exit 0; }
  probe && break
  sleep 240
done
probe || { echo "=== queue5: backend never answered" >> "$LOG"; exit 1; }

echo "=== [$(date -u +%FT%TZ)] queue5 START (int8 + honest MFU)" >> "$LOG"

# 1. int8 microbench probe: isolated conv/dot speedups + on-MXU numerics
echo "=== [$(date -u +%FT%TZ)] START int8_probe" >> "$LOG"
timeout 3600 python scripts/int8_probe.py >> "$LOG" 2>&1
echo "=== [$(date -u +%FT%TZ)] END int8_probe rc=$?" >> "$LOG"

# 2. default bench: validates the QuantConv swap kept the HLO (compile
#    cache must HIT -> run takes ~4-5 min, value reproduces ~0.852) and
#    re-records the row with honest flops (~104 TF/step, MFU ~0.45)
run_item default_honest
echo done_default > "$STATUS"

# 3. int8 at the real workload (the decision measurement)
run_item int8_default    --int8
run_item int8_capreuse5  --int8 --capture_reuse 5 --capture_reuse_deep
echo done_int8_steps > "$STATUS"

# 4. the north-star e2e with int8 stacked on k=5 deep reuse
run_item int8_e2e_fast5  --preset e2e --int8 --inv_reuse 5 --inv_reuse_deep --capture_reuse 5 --capture_reuse_deep

# 5. 720p int8
run_item int8_full720    --preset full720 --stream --natural --int8

# 6. frame-kernel s_blk=128 re-measure (queue4 datapoint invalid; the
#    t_ref floor now rejects collapsed timings) — decide-and-delete knob
echo "=== [$(date -u +%FT%TZ)] START ab_frame_sblk128_retry: MVOC_FRAME_SBLK=128 bench.py" >> "$LOG"
MVOC_FRAME_SBLK=128 timeout 7200 python bench.py >> "$LOG" 2>&1
echo "=== [$(date -u +%FT%TZ)] END ab_frame_sblk128_retry rc=$?" >> "$LOG"

# 7. quality report (CPU-scale; includes the int8 drift rows)
echo "=== [$(date -u +%FT%TZ)] START quality" >> "$LOG"
timeout 7200 python bench.py --preset quality >> "$LOG" 2>&1
echo "=== [$(date -u +%FT%TZ)] END quality rc=$?" >> "$LOG"

echo "=== [$(date -u +%FT%TZ)] queue5 COMPLETE" >> "$LOG"
echo done > "$STATUS"
