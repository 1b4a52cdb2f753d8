#!/usr/bin/env bash
# Round-5 master queue v2 (replaces r5m after the 720p deep-capture OOM
# finding: 17.78 G needed vs 15.75 G HBM — deterministic, so retries were
# pointless).  The 720p accelerated e2e drops capture_reuse_deep; the
# deep step-preset row runs ONCE to record the OOM boundary.  Queue N's
# flash-block A/Bs folded in.  Retries remain for the transient
# remote-compile failures (hang / response-body-closed).
# Stop early: touch /tmp/tpu_queue_stop_r5m2
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r05.log
STATUS=/tmp/tpu_status_r5m2

probe() { timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

run_retry() { # name attempts timeout_s cmd...
  local name=$1 attempts=$2 tmo=$3; shift 3
  local i rc
  for i in $(seq 1 "$attempts"); do
    [ -f /tmp/tpu_queue_stop_r5m2 ] && { echo "=== queueM2: stop requested" >> "$LOG"; exit 0; }
    echo "=== [$(date -u +%FT%TZ)] START $name (attempt $i/$attempts, ${tmo}s): $*" >> "$LOG"
    timeout "$tmo" env "$@" >> "$LOG" 2>&1
    rc=$?
    echo "=== [$(date -u +%FT%TZ)] END $name attempt $i rc=$rc" >> "$LOG"
    echo "$name:$i:$rc" > "$STATUS"
    if [ "$rc" -eq 0 ] && tail -40 "$LOG" | grep -qE '"(metric|classes)"' \
        && ! tail -40 "$LOG" | grep -qE '"error"|invalid_timing'; then
      return 0
    fi
    # deterministic OOM: do not retry
    if tail -60 "$LOG" | grep -q "Ran out of memory in memory space hbm"; then
      echo "=== [$(date -u +%FT%TZ)] $name: OOM (deterministic) — no retry" >> "$LOG"
      return 1
    fi
    sleep 30
  done
  return 1
}

echo "=== [$(date -u +%FT%TZ)] queueM2 probing for backend" >> "$LOG"
for _ in $(seq 1 60); do
  [ -f /tmp/tpu_queue_stop_r5m2 ] && exit 0
  probe && break
  sleep 240
done
probe || { echo "=== queueM2: backend never answered" >> "$LOG"; exit 1; }

# --- the round's key evidence, most valuable first -----------------------
run_retry e2e_720p_fast 4 2400 python bench.py --preset e2e --res 720 --inv_reuse 5 --inv_reuse_deep --reuse_depth 2 --capture_reuse 5
run_retry e2e_720p_exact 4 3000 python bench.py --preset e2e --res 720
run_retry e2e_long64_exact 4 3000 python bench.py --preset e2e --frames 64
run_retry default_retry 3 1800 python bench.py
run_retry e2e_fast5_stagekeyed 3 2400 python bench.py --preset e2e --inv_reuse 5 --inv_reuse_deep --capture_reuse 5 --capture_reuse_deep
run_retry long64_fguard 3 1800 python bench.py --preset long64
# 720p acceleration step rows
run_retry full720_capreuse3 3 1800 python bench.py --preset full720 --stream --natural --capture_reuse 3
run_retry full720_reuse3_depth2 3 1800 python bench.py --preset full720 --stream --natural --reuse 3 --reuse_depth 2
run_retry full720_capreuse3deep 1 1200 python bench.py --preset full720 --stream --natural --capture_reuse 3 --capture_reuse_deep
# 720p flash-block A/Bs (queue N folded in)
run_retry full720_flashq512 3 1800 MVOC_FLASH_BLOCK_Q=512 python bench.py --preset full720 --stream --natural
run_retry full720_flashq512k1024 3 1800 MVOC_FLASH_BLOCK_Q=512 MVOC_FLASH_BLOCK_K=1024 python bench.py --preset full720 --stream --natural
# profiling
run_retry roofline_budget 2 3600 python scripts/roofline_budget.py traces/r5_roofline
run_retry full720_trace 2 3600 python bench.py --preset full720 --stream --natural --trace traces/r5_720p
# pallas-s8 items last with tight bounds
run_retry s8_gemm_probe 2 1500 python scripts/s8_gemm_probe.py
run_retry int8_pallas_default 2 1500 MVOC_S8_IMPL=pallas python bench.py --int8
run_retry e2e_long64_fast 2 2400 python bench.py --preset e2e --frames 64 --inv_reuse 5 --inv_reuse_deep --capture_reuse 5 --capture_reuse_deep
echo done > "$STATUS"
echo "=== [$(date -u +%FT%TZ)] queueM2 COMPLETE" >> "$LOG"
