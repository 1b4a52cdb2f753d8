"""The automatic reuse-k quality gate (utils/autoreuse).

Selection semantics are pinned with injected probes; the probe itself runs
on the tiny random-weight pipeline, where the test pins the property the
gate exists for: degraded (temporally incoherent) content scores a lower
round-trip PSNR than coherent content at the same k — so with a threshold
between the two, the degraded video lands on a smaller k.
"""

import numpy as np
import pytest

from mvoc_tpu.utils import testing as tt
from mvoc_tpu.utils.autoreuse import make_invert_probe, select_reuse_k


def test_select_picks_largest_passing_k():
    scores = {5: 28.0, 3: 31.0, 2: 33.0}
    probed = []

    def probe(k):
        probed.append(k)
        return scores[k]

    k, report = select_reuse_k(probe, candidates=(2, 3, 5), threshold_db=30.0)
    assert k == 3
    assert probed == [5, 3]  # descending, stops at first pass; 2 never probed
    assert [r["k"] for r in report] == [5, 3]
    assert report[0]["passed"] is False and report[1]["passed"] is True


def test_select_all_fail_returns_exact():
    k, report = select_reuse_k(lambda k: 20.0, candidates=(5, 3, 2),
                               threshold_db=30.0)
    assert k == 1
    assert len(report) == 3 and not any(r["passed"] for r in report)


def test_stricter_threshold_selects_smaller_k():
    scores = {5: 35.0, 3: 38.0, 2: 41.0}
    ks = [select_reuse_k(lambda k: scores[k], candidates=(5, 3, 2),
                         threshold_db=thr)[0]
          for thr in (34.0, 37.0, 40.0, 45.0)]
    assert ks == [5, 3, 2, 1]
    assert all(a >= b for a, b in zip(ks, ks[1:]))


@pytest.fixture(scope="module")
def pipe():
    return tt.build_tiny_pipeline()


def _smooth_frames(n=tt.TINY_FRAMES, size=tt.TINY_HW):
    """Temporally coherent content: a gradient with simple motion."""
    from PIL import Image

    ramp = np.linspace(0, 255, size, dtype=np.uint8)
    base = np.stack([np.tile(ramp, (size, 1))] * 3, axis=-1)
    return [Image.fromarray(np.roll(base, shift=i, axis=1)) for i in range(n)]


def _degraded_frames(n=tt.TINY_FRAMES, size=tt.TINY_HW, seed=7):
    """Temporally incoherent content: independent noise per frame."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    return [Image.fromarray(rng.integers(0, 255, (size, size, 3), dtype=np.uint8))
            for _ in range(n)]


def test_degraded_video_selects_smaller_k(pipe):
    hw = tt.TINY_HW
    kw = dict(height=hw, width=hw, num_frames=tt.TINY_FRAMES, probe_steps=4)
    p_smooth = make_invert_probe(pipe, _smooth_frames(), **kw)
    p_degraded = make_invert_probe(pipe, _degraded_frames(), **kw)
    s_smooth = p_smooth(2)
    s_degraded = p_degraded(2)
    assert np.isfinite(s_smooth) and np.isfinite(s_degraded)
    # the property the gate rides on: incoherent content reconstructs worse
    assert s_smooth > s_degraded, (s_smooth, s_degraded)
    thr = (s_smooth + s_degraded) / 2.0
    k_smooth, _ = select_reuse_k(p_smooth, candidates=(2,), threshold_db=thr)
    k_degraded, _ = select_reuse_k(p_degraded, candidates=(2,), threshold_db=thr)
    assert k_smooth == 2 and k_degraded == 1
