"""freeinit + affine ops: numeric parity with torch/cv analogues."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from mvoc_tpu.ops import affine, freeinit


def test_lowpass_mask_range_and_shape():
    m = freeinit.lowpass_mask(4, 8, 8, d_s=0.25, d_t=0.25)
    assert m.shape == (4, 8, 8)
    assert float(m.max()) <= 1.0 and float(m.min()) >= 0.0
    # center (DC) is the max
    assert float(m[2, 4, 4]) == pytest.approx(float(m.max()), abs=1e-6)


def test_freq_mix_identity_extremes(rng):
    lat = jnp.asarray(rng.standard_normal((4, 8, 8, 2), dtype=np.float32))
    noise = jnp.asarray(rng.standard_normal((4, 8, 8, 2), dtype=np.float32))
    ones = jnp.ones((4, 8, 8))
    zeros = jnp.zeros((4, 8, 8))
    np.testing.assert_allclose(np.asarray(freeinit.freq_mix(lat, noise, ones)),
                               np.asarray(lat), atol=1e-4)
    np.testing.assert_allclose(np.asarray(freeinit.freq_mix(lat, noise, zeros)),
                               np.asarray(noise), atol=1e-4)


def test_frameinit_statistics(rng):
    from mvoc_tpu.ops.ddim import DDIM, SchedulerConfig

    ddim = DDIM(SchedulerConfig())
    lat = jnp.asarray(rng.standard_normal((4, 8, 8, 4), dtype=np.float32))
    out = freeinit.frameinit(lat, jax.random.key(0), ddim.alphas_cumprod,
                             noise_level=850)
    assert out.shape == lat.shape
    # at noise level 850 the result is noise-dominated: roughly unit variance
    assert 0.5 < float(jnp.std(out)) < 2.0


def test_warp_affine_identity(rng):
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 3), dtype=np.float32))
    theta = jnp.asarray(np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32))
    out = affine.warp_affine(x, theta, (6, 8))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_warp_affine_matches_torch_grid_sample(rng):
    """Normalized-affine warp must match F.affine_grid + grid_sample
    (align_corners=False, nearest) — the reference's warp convention
    (utils.py:178-180)."""
    x = rng.standard_normal((1, 5, 7, 2), dtype=np.float32)
    theta = np.array([[0.8, 0.1, 0.05], [-0.05, 0.9, -0.1]], np.float32)

    out = affine.warp_affine(jnp.asarray(x), jnp.asarray(theta), (5, 7), mode="nearest")

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    grid = F.affine_grid(torch.from_numpy(theta)[None], (1, 2, 5, 7), align_corners=False)
    ref = F.grid_sample(xt, grid, mode="nearest", align_corners=False,
                        padding_mode="zeros")
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_place_object_shift(rng):
    x = np.zeros((1, 8, 8, 1), np.float32)
    x[0, 0, 0, 0] = 1.0
    out = affine.place_object(jnp.asarray(x), scale=1.0, tx=3.0, ty=2.0)
    assert float(out[0, 2, 3, 0]) == pytest.approx(1.0)
    assert float(np.asarray(out).sum()) == pytest.approx(1.0)
