#!/usr/bin/env bash
# Round-4 measurement queue (ADVICE r3 medium + north-star operating points).
#
# Re-measures every README row that was recorded before the one-pass ->
# two-pass GroupNorm swap (commit 7628be4 landed MID-queue in round 3, so
# capreuse3[deep]/full720/long64/e2e--batch rows carry ~2.6% optimism), then
# measures the k=5 deep-reuse operating point for the north-star e2e.
#
# Probes the axon backend (bounded subprocess — jax.devices() hangs during
# outages) every 4 min until it answers; stop early with
#   touch /tmp/tpu_queue_stop4
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r04.log
STATUS=/tmp/tpu_status4

probe() {
  timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run_item() { # name, args...
  local name=$1; shift
  [ -f /tmp/tpu_queue_stop4 ] && { echo "=== queue4: stop requested" >> "$LOG"; exit 0; }
  echo "=== [$(date -u +%FT%TZ)] START $name: bench.py $*" >> "$LOG"
  timeout 7200 python bench.py "$@" >> "$LOG" 2>&1
  echo "=== [$(date -u +%FT%TZ)] END $name rc=$?" >> "$LOG"
}

echo "=== [$(date -u +%FT%TZ)] queue4 probing for backend" >> "$LOG"
for _ in $(seq 1 2000); do
  [ -f /tmp/tpu_queue_stop4 ] && { echo "=== queue4: stop requested" >> "$LOG"; exit 0; }
  probe && break
  sleep 240
done
probe || { echo "=== queue4: backend never answered" >> "$LOG"; exit 1; }

echo "=== [$(date -u +%FT%TZ)] queue4 START (post-GroupNorm-swap re-measures)" >> "$LOG"
run_item default                              # warm + validate (cache current)
run_item capreuse3       --capture_reuse 3
run_item capreuse3deep   --capture_reuse 3 --capture_reuse_deep
run_item capreuse5deep   --capture_reuse 5 --capture_reuse_deep  # same compiles as k=3
run_item full720         --preset full720 --stream --natural
run_item long64          --preset long64 --stream --natural
echo done_steps > "$STATUS"
run_item e2e_fast3       --preset e2e --inv_reuse 3 --inv_reuse_deep --capture_reuse 3 --capture_reuse_deep
run_item e2e_fast5       --preset e2e --inv_reuse 5 --inv_reuse_deep --capture_reuse 5 --capture_reuse_deep
echo done_e2e > "$STATUS"

# kernel-knob A/Bs on the default preset (measure-and-decide: flip the
# default on a win, delete the knob on a loss — no unmeasured env-var
# inventory may survive the round)
run_ab() { # name, VAR=VAL...
  local name=$1; shift
  [ -f /tmp/tpu_queue_stop4 ] && { echo "=== queue4: stop requested" >> "$LOG"; exit 0; }
  echo "=== [$(date -u +%FT%TZ)] START $name: $* bench.py" >> "$LOG"
  env "$@" timeout 7200 python bench.py >> "$LOG" 2>&1
  echo "=== [$(date -u +%FT%TZ)] END $name rc=$?" >> "$LOG"
}
run_ab ab_flash_q256     MVOC_FLASH_BLOCK_Q=256
run_ab ab_flash_q1024    MVOC_FLASH_BLOCK_Q=1024
run_ab ab_flash_k512     MVOC_FLASH_BLOCK_K=512
run_ab ab_frame_sblk128  MVOC_FRAME_SBLK=128
run_ab ab_scoped_vmem64m XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536
echo "=== [$(date -u +%FT%TZ)] queue4 COMPLETE" >> "$LOG"
echo done > "$STATUS"
