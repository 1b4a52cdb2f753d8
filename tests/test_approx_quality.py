"""Bounded-drift guarantees for the approximate acceleration modes.

VERDICT r2 directive #3: mechanism tests ("differs from exact, finite")
cannot catch a semantically wrong cache wiring.  These tests run exact vs
approximate at tiny scale (utils/quality) and pin BOUNDS on the latent
drift: correct k=2 reuse drifts mildly, while a wrong broadcast (stale
tensor, swapped branch, mis-indexed cache) lands near rel_l2 ~ 1.0-1.4
(the scale of two unrelated latents).

Random weights at tiny scale — the bound is an ALGORITHMIC cache-wiring
check, not a visual-quality claim (that needs real weights:
docs/FIRST_HOUR_WITH_WEIGHTS.md step 5).  Bounds are ~1.3x the measured
round-3 values (quality report, 2026-08-18: encoder k2 0.644 / capture k2
0.536 / capture-deep k2 0.737; inversion traj 0.077-0.083, xT 0.184) to
absorb seed/platform noise without letting wiring bugs through.  CI runs
the core modes; `bench.py --preset quality` reports the full table
(+ partial-depth reuse, PAB).
"""

import pytest

from mvoc_tpu.utils.quality import (approx_quality_report, latent_metrics,
                                    _TinyHarness)

CI_COMPOSITE_MODES = (
    ("encoder_reuse_k2", dict(encoder_reuse_interval=2)),
    ("capture_reuse_k2", dict(capture_reuse_interval=2)),
    ("capture_reuse_k2_deep", dict(capture_reuse_interval=2,
                                   capture_reuse_deep=True)),
)

COMPOSITE_BOUNDS = {
    # mode: max rel_l2 (exact-vs-approx final composite latents)
    "encoder_reuse_k2": 0.85,
    "capture_reuse_k2": 0.72,
    "capture_reuse_k2_deep": 0.95,
}


@pytest.fixture(scope="module")
def harness():
    return _TinyHarness(seed=0)


@pytest.fixture(scope="module")
def report(harness):
    return approx_quality_report(composite_modes=CI_COMPOSITE_MODES,
                                 harness=harness)


@pytest.mark.parametrize("mode", sorted(COMPOSITE_BOUNDS))
def test_composite_mode_drift_bounded(report, mode):
    m = report[mode]
    assert m["rel_l2"] > 0.0, f"{mode} bit-identical to exact — the knob " \
        "did nothing (broken dispatch)"
    assert m["rel_l2"] < COMPOSITE_BOUNDS[mode], (
        f"{mode} drift {m} exceeds the wiring-bug bound — a cache is "
        "broadcasting the wrong tensor")


def test_inversion_reuse_drift_bounded(report):
    """deep_reuse approximates the trajectory every downstream stage
    consumes — the tightest-guarded mode."""
    for mode in ("inv_encoder_reuse_k2", "inv_deep_reuse_k2"):
        m = report[mode]
        assert 0.0 < m["rel_l2"] < 0.15, f"{mode}: {m}"
        assert 0.0 < m["xT_rel_l2"] < 0.30, f"{mode} xT: {m}"
    # deep (encoder + attention broadcast) must not drift LESS than plain
    # encoder reuse — if it does, the PAB branch silently never engaged
    assert (report["inv_deep_reuse_k2"]["rel_l2"]
            >= report["inv_encoder_reuse_k2"]["rel_l2"]), (
        "deep_reuse drifted less than plain reuse — the PAB cache path "
        "likely never engaged")


def test_wrong_wiring_is_caught(harness, report):
    """Sanity that the bound has teeth: maximal staleness (ONE capture
    broadcast across every step — the stale-cache failure shape) drifts
    markedly more than the k=2 schedule."""
    exact = harness.run_composite()
    k2 = harness.run_composite(capture_reuse_interval=2)  # memoized
    stale = harness.run_composite(
        capture_reuse_interval=harness.compose_steps * 2)
    m_stale = latent_metrics(stale, exact)
    m_k2 = latent_metrics(k2, exact)
    assert m_stale["rel_l2"] > m_k2["rel_l2"], (m_stale, m_k2)
