#!/usr/bin/env bash
# Round-5 master queue v3.  v2 findings: 720p capture-reuse composites
# exceed 16 GB HBM at every depth (17.8/19.3 G) and their compiles also
# SIGKILL the remote compile helper — the config is dropped; the fitting
# 720p acceleration is partial-depth encoder reuse, probed at the step
# level BEFORE its e2e variant runs.  Exact 720p e2e leads (the round's
# key missing artifact).
# Stop early: touch /tmp/tpu_queue_stop_r5m3
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r05.log
STATUS=/tmp/tpu_status_r5m3

probe() { timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

run_retry() { # name attempts timeout_s cmd...
  local name=$1 attempts=$2 tmo=$3; shift 3
  local i rc start
  for i in $(seq 1 "$attempts"); do
    [ -f /tmp/tpu_queue_stop_r5m3 ] && { echo "=== queueM3: stop requested" >> "$LOG"; exit 0; }
    start=$(grep -c "" "$LOG")
    echo "=== [$(date -u +%FT%TZ)] START $name (attempt $i/$attempts, ${tmo}s): $*" >> "$LOG"
    timeout "$tmo" env "$@" >> "$LOG" 2>&1
    rc=$?
    echo "=== [$(date -u +%FT%TZ)] END $name attempt $i rc=$rc" >> "$LOG"
    echo "$name:$i:$rc" > "$STATUS"
    if [ "$rc" -eq 0 ] && tail -n +"$start" "$LOG" | grep -qE '"(metric|classes)"' \
        && ! tail -n +"$start" "$LOG" | grep -qE '"error"|invalid_timing'; then
      return 0
    fi
    # deterministic failures: no retry (scan the WHOLE attempt's output)
    if tail -n +"$start" "$LOG" | grep -qE "Ran out of memory in memory space hbm|exit signal SIGKILL"; then
      echo "=== [$(date -u +%FT%TZ)] $name: deterministic failure — no retry" >> "$LOG"
      return 1
    fi
    sleep 30
  done
  return 1
}

echo "=== [$(date -u +%FT%TZ)] queueM3 probing for backend" >> "$LOG"
for _ in $(seq 1 60); do
  [ -f /tmp/tpu_queue_stop_r5m3 ] && exit 0
  probe && break
  sleep 240
done
probe || { echo "=== queueM3: backend never answered" >> "$LOG"; exit 1; }

run_retry e2e_720p_exact 4 3000 python bench.py --preset e2e --res 720
run_retry e2e_long64_exact 4 3000 python bench.py --preset e2e --frames 64
run_retry default_retry 3 1800 python bench.py
run_retry e2e_fast5_stagekeyed 3 2400 python bench.py --preset e2e --inv_reuse 5 --inv_reuse_deep --capture_reuse 5 --capture_reuse_deep
run_retry long64_fguard 3 1800 python bench.py --preset long64
# 720p acceleration: partial-depth encoder reuse at the step level first
run_retry full720_reuse3_depth2 3 1800 python bench.py --preset full720 --stream --natural --reuse 3 --reuse_depth 2
# then the 720p accelerated e2e on the SAME mechanism
run_retry e2e_720p_fast2 3 2400 python bench.py --preset e2e --res 720 --inv_reuse 5 --inv_reuse_deep --reuse_depth 2 --reuse 3
# 720p flash-block A/Bs
run_retry full720_flashq512 3 1800 MVOC_FLASH_BLOCK_Q=512 python bench.py --preset full720 --stream --natural
run_retry full720_flashq512k1024 3 1800 MVOC_FLASH_BLOCK_Q=512 MVOC_FLASH_BLOCK_K=1024 python bench.py --preset full720 --stream --natural
# profiling
run_retry roofline_budget 2 3600 python scripts/roofline_budget.py traces/r5_roofline
run_retry full720_trace 2 3600 python bench.py --preset full720 --stream --natural --trace traces/r5_720p
# pallas-s8 last
run_retry s8_gemm_probe 2 1500 python scripts/s8_gemm_probe.py
run_retry int8_pallas_default 2 1500 MVOC_S8_IMPL=pallas python bench.py --int8
run_retry e2e_long64_fast 2 2400 python bench.py --preset e2e --frames 64 --inv_reuse 5 --inv_reuse_deep --capture_reuse 5 --capture_reuse_deep
echo done > "$STATUS"
echo "=== [$(date -u +%FT%TZ)] queueM3 COMPLETE" >> "$LOG"
