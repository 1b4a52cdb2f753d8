"""Unit tests for core._blockwise_cached_scan — the statically partitioned
fresh/cached step loop that replaces lax.cond-in-scan for encoder reuse and
PAB broadcast (reference has no analogue; this is the TPU-native compilation
strategy for training-free caching, see pipeline/core.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvoc_tpu.pipeline.core import _blockwise_cached_scan


def _reference_loop(init, xs, n, k):
    """Naive python loop with identical semantics: step i fresh iff i%k==0."""
    lat = init
    ys = []
    cache = None
    for i in range(n):
        x = xs[i]
        if i % k == 0:
            cache = lat * 0.5 + x          # "encoder" output
            lat = lat + cache + x
        else:
            lat = lat + cache + x
        ys.append(lat)
    return lat, jnp.stack(ys)


def _steps():
    def step_fresh(lat, x):
        cache = lat * 0.5 + x
        nxt = lat + cache + x
        return nxt, cache, nxt

    def step_cached(lat, cache, x):
        nxt = lat + cache + x
        return nxt, nxt

    return step_fresh, step_cached


@pytest.mark.parametrize("n,k", [(6, 3), (7, 3), (5, 2), (4, 5), (1, 3), (8, 1)])
def test_blockwise_matches_reference_loop(n, k):
    xs = jnp.arange(1.0, n + 1.0)
    init = jnp.asarray(2.0)
    step_fresh, step_cached = _steps()
    if k == 1:
        # k=1 means every step is fresh — blockwise degenerates to width-1
        # blocks; still must match the reference loop
        pass
    final, ys = jax.jit(
        lambda i, x: _blockwise_cached_scan(step_fresh, step_cached, i, x, n, k)
    )(init, xs)
    ref_final, ref_ys = _reference_loop(init, xs, n, k)
    np.testing.assert_allclose(np.asarray(final), np.asarray(ref_final), rtol=1e-6)
    assert ys.shape[0] == n
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref_ys), rtol=1e-6)


def test_blockwise_none_ys():
    """Steps yielding None must return ys=None (composite path uses this)."""
    n, k = 7, 3
    xs = jnp.arange(float(n))

    def step_fresh(lat, x):
        return lat + x, lat, None

    def step_cached(lat, cache, x):
        return lat + cache + x, None

    final, ys = _blockwise_cached_scan(step_fresh, step_cached,
                                       jnp.asarray(1.0), xs, n, k)
    assert ys is None
    assert np.isfinite(np.asarray(final))


def test_blockwise_pytree_xs_and_ys():
    """xs/ys may be pytrees; leading axes must stack across blocks + remainder."""
    n, k = 5, 2
    xs = {"t": jnp.arange(float(n)), "g": jnp.ones((n, 2))}

    def step_fresh(lat, x):
        cache = x["g"].sum()
        nxt = lat + x["t"] + cache
        return nxt, cache, {"y": nxt}

    def step_cached(lat, cache, x):
        nxt = lat + x["t"] + cache
        return nxt, {"y": nxt}

    final, ys = _blockwise_cached_scan(step_fresh, step_cached,
                                       jnp.asarray(0.0), xs, n, k)
    assert ys["y"].shape == (n,)
    # last element of ys == final carry
    np.testing.assert_allclose(np.asarray(ys["y"][-1]), np.asarray(final))
