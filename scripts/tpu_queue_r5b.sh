#!/usr/bin/env bash
# Round-5 queue B (chains after queue A): the decision + evidence runs.
#  1. s8 GEMM probe (VERDICT r4 #3 — pallas s8 vs bf16, >=1.3x gate)
#  2. pab2 on the default preset (VERDICT #6 — decide the per-kind-PAB
#     roadmap item on the measured base rate)
#  3-4. 720p acceleration rows (VERDICT #2): capture-reuse deep and
#     partial-depth encoder reuse at the reference's suite resolution
#  5-6. 720p e2e: accelerated operating point + exact control
#  7. long64 e2e exact (VERDICT #5) with streamed trajectories
#  8. default retry for the invalid-timing record from queue A item 1
# Stop early: touch /tmp/tpu_queue_stop_r5b
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r05.log
STATUS=/tmp/tpu_status_r5b

probe() {
  timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run_item() { # name, then full command words
  local name=$1; shift
  [ -f /tmp/tpu_queue_stop_r5b ] && { echo "=== queueB: stop requested" >> "$LOG"; exit 0; }
  echo "=== [$(date -u +%FT%TZ)] START $name: $*" >> "$LOG"
  timeout 7200 env "$@" >> "$LOG" 2>&1
  echo "=== [$(date -u +%FT%TZ)] END $name rc=$?" >> "$LOG"
  echo "$name" > "$STATUS"
}

# wait for queue A to finish (max ~6h), then for the backend
for _ in $(seq 1 360); do
  [ -f /tmp/tpu_queue_stop_r5b ] && exit 0
  [ "$(cat /tmp/tpu_status_r5a 2>/dev/null)" = "done" ] && break
  sleep 60
done
echo "=== [$(date -u +%FT%TZ)] queueB probing for backend" >> "$LOG"
for _ in $(seq 1 50); do
  [ -f /tmp/tpu_queue_stop_r5b ] && exit 0
  probe && break
  sleep 240
done
probe || { echo "=== queueB: backend never answered" >> "$LOG"; exit 1; }

run_item s8_gemm_probe python scripts/s8_gemm_probe.py
run_item pab2_default python bench.py --pab 2
run_item full720_capreuse3deep python bench.py --preset full720 --stream --natural --capture_reuse 3 --capture_reuse_deep
run_item full720_reuse3_depth2 python bench.py --preset full720 --stream --natural --reuse 3 --reuse_depth 2
run_item e2e_720p_fast python bench.py --preset e2e --res 720 --inv_reuse 5 --inv_reuse_deep --reuse_depth 2 --capture_reuse 5 --capture_reuse_deep
run_item e2e_720p_exact python bench.py --preset e2e --res 720
run_item e2e_long64_exact python bench.py --preset e2e --frames 64
run_item default_retry python bench.py
echo done > "$STATUS"
echo "=== [$(date -u +%FT%TZ)] queueB COMPLETE" >> "$LOG"
