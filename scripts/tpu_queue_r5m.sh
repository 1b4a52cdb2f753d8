#!/usr/bin/env bash
# Round-5 MASTER queue (replaces the stopped B-tail/C/D2/E chains).
#
# The axon remote-compile service is flaky today: new-HLO compiles hang
# indefinitely or die with "response body closed" (~1 in 5 succeeded
# plain).  Mitigation: every item runs under a BOUNDED timeout with
# RETRIES — the persistent compile cache makes each retry incremental
# (compiled programs from a failed attempt are reused), so short attempts
# converge to a completed run.
# Stop early: touch /tmp/tpu_queue_stop_r5m
set -u
cd /root/repo
LOG=/root/repo/TPU_RUNS_r05.log
STATUS=/tmp/tpu_status_r5m

probe() { timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

run_retry() { # name attempts timeout_s cmd...
  local name=$1 attempts=$2 tmo=$3; shift 3
  local i rc
  for i in $(seq 1 "$attempts"); do
    [ -f /tmp/tpu_queue_stop_r5m ] && { echo "=== queueM: stop requested" >> "$LOG"; exit 0; }
    echo "=== [$(date -u +%FT%TZ)] START $name (attempt $i/$attempts, ${tmo}s): $*" >> "$LOG"
    timeout "$tmo" env "$@" >> "$LOG" 2>&1
    rc=$?
    echo "=== [$(date -u +%FT%TZ)] END $name attempt $i rc=$rc" >> "$LOG"
    echo "$name:$i:$rc" > "$STATUS"
    # success = clean exit AND a real record in the tail (bench "metric"
    # or the roofline's "classes"); structured {"error": ...} records and
    # invalid-timing refusals retry
    if [ "$rc" -eq 0 ] && tail -40 "$LOG" | grep -qE '"(metric|classes)"' \
        && ! tail -40 "$LOG" | grep -qE '"error"|invalid_timing'; then
      return 0
    fi
    sleep 30
  done
  return 1
}

echo "=== [$(date -u +%FT%TZ)] queueM probing for backend" >> "$LOG"
for _ in $(seq 1 60); do
  [ -f /tmp/tpu_queue_stop_r5m ] && exit 0
  probe && break
  sleep 240
done
probe || { echo "=== queueM: backend never answered" >> "$LOG"; exit 1; }

# --- the round's key evidence, most valuable first -----------------------
# 720p e2e (suite resolution; BASELINE configs[2]).  Accelerated first
# (shorter run once compiled), then exact.
run_retry e2e_720p_fast 4 2400 python bench.py --preset e2e --res 720 --inv_reuse 5 --inv_reuse_deep --reuse_depth 2 --capture_reuse 5 --capture_reuse_deep
run_retry e2e_720p_exact 4 3000 python bench.py --preset e2e --res 720
# long64 e2e exact (BASELINE configs[3]) with streamed trajectories
run_retry e2e_long64_exact 4 3000 python bench.py --preset e2e --frames 64
# headline default re-record (shipped 4096 + F<=16 stage-keyed config)
run_retry default_retry 3 1800 python bench.py
# stage-keyed e2e confirmation (projection 187.1 s)
run_retry e2e_fast5_stagekeyed 3 2400 python bench.py --preset e2e --inv_reuse 5 --inv_reuse_deep --capture_reuse 5 --capture_reuse_deep
# long64 step re-record after the F<=16 guard (expect ~0.185 honest)
run_retry long64_fguard 3 1800 python bench.py --preset long64
# 720p acceleration rows (the failed/hung queue-B items)
run_retry full720_capreuse3deep 3 1800 python bench.py --preset full720 --stream --natural --capture_reuse 3 --capture_reuse_deep
run_retry full720_reuse3_depth2 3 1800 python bench.py --preset full720 --stream --natural --reuse 3 --reuse_depth 2
# roofline budget + 720p trace (profiling; mostly cached programs)
run_retry roofline_budget 2 3600 python scripts/roofline_budget.py traces/r5_roofline
run_retry full720_trace 2 3600 python bench.py --preset full720 --stream --natural --trace traces/r5_720p
# pallas-s8 items LAST with tight bounds (Mosaic-compile hang suspicion)
run_retry s8_gemm_probe 2 1500 python scripts/s8_gemm_probe.py
run_retry int8_pallas_default 2 1500 MVOC_S8_IMPL=pallas python bench.py --int8
# long64 accelerated e2e (stretch)
run_retry e2e_long64_fast 2 2400 python bench.py --preset e2e --frames 64 --inv_reuse 5 --inv_reuse_deep --capture_reuse 5 --capture_reuse_deep
echo done > "$STATUS"
echo "=== [$(date -u +%FT%TZ)] queueM COMPLETE" >> "$LOG"
