"""Unit tests for bench.py's measurement machinery.

The bench numbers are the repo's judged deliverable, and the axon runtime
has produced provably-bogus timings before (a chained 10-step loop returned
in 12 ms => 807 steps/s, MFU 255 — TPU_RUNS_r03.log natblk2_default), so the
timing helpers themselves need pinning:

  * timed_loop accepts honest chained timings and re-times with per-step
    blocking when the chained loop is impossibly fast vs the expected
    blocked per-step reference (ADVICE r3: t_ref is the fresh/cached MIX);
  * with a trace dir, the profiler wraps ONLY the loop whose dt is
    returned (the anomaly re-time traces into DIR/retime, so the bogus
    chained loop never pollutes the device-op breakdown);
  * mfu_fields weights multi-program steps by their call fractions.
"""

import importlib.util
import os
import sys
import time

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_pick_block_prefers_divisors():
    # 14400 (720p h*w) doesn't divide 1024; largest 16-multiple divisor wins
    from mvoc_tpu.ops.attention import _pick_block

    assert _pick_block(4096, 512) == 512
    assert _pick_block(4096, 1024) == 1024
    b = _pick_block(14400, 1024)
    assert 14400 % b == 0 and b % 16 == 0 and b <= 1024
    # prime-ish seq: fall back to the target (kernel pads + masks)
    assert _pick_block(14401, 512) == 512


def test_timed_loop_honest_chain_no_anomaly():
    calls = []

    def body(i):
        calls.append(i)
        time.sleep(0.01)

    dt, anomaly = bench.timed_loop(5, body, lambda: np.zeros(1), t_ref=0.01)
    assert not anomaly
    assert len(calls) == 5
    assert dt >= 0.04


def test_timed_loop_retimes_impossibly_fast_chain():
    # chained loop is instant but the blocked reference says 1 s/step:
    # the guard must fire and re-run with per-step blocking (2x the calls)
    calls = []
    dt, anomaly = bench.timed_loop(
        4, lambda i: calls.append(i), lambda: np.zeros(1), t_ref=1.0)
    assert anomaly
    assert len(calls) == 8  # chained pass + blocked re-time


def test_timed_loop_trace_dir_wraps_returned_loop(tmp_path):
    # anomaly path: the breakdown must come from DIR/retime (only the
    # blocked loop), not the bogus chained loop's trace
    import jax

    jax.config.update("jax_platforms", "cpu")
    x = jax.jit(lambda a: a * 2)(np.ones(8, np.float32))
    tdir = str(tmp_path / "tr")

    def body(i):
        jax.jit(lambda a: a + i)(x).block_until_ready()

    dt, anomaly = bench.timed_loop(3, body, lambda: x, t_ref=10.0,
                                   trace_dir=tdir)
    assert anomaly
    assert os.path.isdir(os.path.join(tdir, "retime"))
    # both traces exist; the retime one holds the returned loop
    import glob

    assert glob.glob(os.path.join(tdir, "retime", "**", "*.trace.json.gz"),
                     recursive=True)


def test_mfu_fields_weights_program_mix():
    # k=3 reuse: fresh program 1/3 of steps at 60 TF, cached 2/3 at 30 TF
    out = bench.mfu_fields([(60e12, 1 / 3), (30e12, 2 / 3)], 2.0)
    assert out["model_tflops_per_step"] == 40.0
    assert out["achieved_tflops_per_sec"] == 80.0


def test_timed_loop_floor_rejects_collapsed_blocked_retime():
    """The ab_frame_sblk128 failure mode: t_ref ITSELF collapsed (the
    blocked reference step returned instantly), so the /3 guard had nothing
    to stand on.  With a physical floor, the chained loop is flagged, the
    blocked re-time ALSO beats the floor, and the result comes back
    "invalid" for emit() to refuse."""
    dt, anomaly = bench.timed_loop(
        4, lambda i: None, lambda: np.zeros(1), t_ref=0.001, t_floor=1.0)
    assert anomaly == "invalid"


def test_timed_loop_floor_clamps_low_t_ref_but_honest_run_passes():
    def body(i):
        time.sleep(0.4)

    # collapsed t_ref (0.001) but honest 0.4 s/step vs floor 0.5: the
    # chained run is above floor/3, so no anomaly at all
    dt, anomaly = bench.timed_loop(
        2, body, lambda: np.zeros(1), t_ref=0.001, t_floor=0.5)
    assert not anomaly
    assert dt >= 0.8


def test_emit_refuses_impossible_mfu(capsys):
    import json

    bench.emit({"metric": "m", "value": 564.0, "unit": "steps/s",
                "mfu": 178.4}, anomaly=False)
    rec = json.loads(capsys.readouterr().out)
    assert rec["error"] == "invalid_timing"
    assert rec["value"] is None
    assert rec["detail"]["value"] == 564.0


def test_emit_passes_honest_record_and_suffix(capsys, monkeypatch):
    import json

    monkeypatch.setattr(bench, "METRIC_SUFFIX", "_int8")
    bench.emit({"metric": "m", "value": 0.85, "unit": "steps/s",
                "mfu": 0.45}, anomaly=True)
    rec = json.loads(capsys.readouterr().out)
    assert rec["metric"] == "m_int8"
    assert rec["value"] == 0.85 and rec["async_anomaly"] is True
    assert "error" not in rec


def test_step_floor_from_costs(monkeypatch):
    monkeypatch.setattr(bench, "peak_tflops_per_sec", lambda: 100e12)
    # 50 TF mixed step at 100 TF/s peak -> 0.5 s floor
    assert bench.step_floor([(100e12, 0.25), (100e12 / 3, 0.75)]) == \
        pytest.approx(0.5)
    monkeypatch.setattr(bench, "peak_tflops_per_sec", lambda: None)
    assert bench.step_floor([(1e12, 1.0)]) == 0.0


def test_probe_backend_structured_failure(monkeypatch):
    # interpreter that always fails => every attempt logs a structured
    # failure and ok=False (the outage path that must NOT raise)
    monkeypatch.setattr(bench.sys, "executable", "/bin/false")
    ok, log = bench.probe_backend(attempts=2, probe_timeout=5, retry_sleep=0)
    assert not ok
    assert len(log) == 2 and all(not e["ok"] for e in log)
