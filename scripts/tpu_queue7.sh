#!/usr/bin/env bash
# Round-4 fourth queue: re-record the README perf rows with the temporal
# stack3 conv dispatch shipped (each needs one fresh compile — HLO changed),
# most-visible rows first; includes the two orphaned honest-flops re-records
# (full720, long64) queue6 never finished.
# Waits for /tmp/e2e_done (the e2e_fast5_tconv run) before touching the chip.
# Stop early: touch /tmp/tpu_queue_stop7
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r04.log
STATUS=/tmp/tpu_status7

probe() {
  timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run_item() { # name, args...
  local name=$1; shift
  [ -f /tmp/tpu_queue_stop7 ] && { echo "=== queue7: stop requested" >> "$LOG"; exit 0; }
  echo "=== [$(date -u +%FT%TZ)] START $name: bench.py $*" >> "$LOG"
  timeout 7200 python bench.py "$@" >> "$LOG" 2>&1
  echo "=== [$(date -u +%FT%TZ)] END $name rc=$?" >> "$LOG"
  echo "$name" > "$STATUS"
}

# wait for the foreground e2e run to release the chip
for _ in $(seq 1 200); do
  [ -f /tmp/tpu_queue_stop7 ] && exit 0
  [ -f /tmp/e2e_done ] && break
  sleep 60
done

echo "=== [$(date -u +%FT%TZ)] queue7 probing for backend" >> "$LOG"
for _ in $(seq 1 50); do
  [ -f /tmp/tpu_queue_stop7 ] && exit 0
  probe && break
  sleep 240
done
probe || { echo "=== queue7: backend never answered" >> "$LOG"; exit 1; }

run_item capreuse5deep_tconv --capture_reuse 5 --capture_reuse_deep
run_item full720_tconv --preset full720 --stream --natural
run_item long64_tconv --preset long64
run_item capreuse3deep_tconv --capture_reuse 3 --capture_reuse_deep
run_item capreuse3_tconv --capture_reuse 3
echo done > "$STATUS"
echo "=== [$(date -u +%FT%TZ)] queue7 COMPLETE" >> "$LOG"
