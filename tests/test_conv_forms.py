"""Parity of the matmul-form convs (ops/conv.py) against lax.conv.

Each form is mathematically the same conv (same f32 MXU accumulation;
only tap-summation order differs), so parity is pinned at fp32 near-exact
and at bf16 within rounding of the op itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvoc_tpu.ops import conv as C


def _ref_conv2d(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
        preferred_element_type=jnp.float32).astype(x.dtype)


def _ref_tconv(x5, w):
    dn = jax.lax.conv_dimension_numbers(x5.shape, w.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    return jax.lax.conv_general_dilated(
        x5, w, (1, 1, 1), ((1, 1), (0, 0), (0, 0)), dimension_numbers=dn,
        preferred_element_type=jnp.float32).astype(x5.dtype)


@pytest.mark.parametrize("form", [C.conv3x3_stack9, C.conv3x3_wcat3,
                                  C.conv3x3_im2col9])
@pytest.mark.parametrize("shape,cout", [
    ((2, 8, 8, 16), 16),    # square tier
    ((1, 6, 10, 8), 24),    # rectangular H != W, C_out != C_in
    ((3, 5, 5, 12), 4),     # odd spatial
])
def test_conv3x3_forms_match_lax_fp32(form, shape, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, shape[-1], cout)) * 0.1,
                    jnp.float32)
    ref = _ref_conv2d(x, w)
    got = form(x, w)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("form", [C.conv3x3_stack9, C.conv3x3_wcat3,
                                  C.conv3x3_im2col9])
def test_conv3x3_forms_match_lax_bf16(form):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 32)) * 0.1, jnp.bfloat16)
    ref = _ref_conv2d(x, w).astype(jnp.float32)
    got = form(x, w).astype(jnp.float32)
    # bf16 inputs, f32 accumulation in both: differences are bf16
    # rounding of intermediates only
    err = np.max(np.abs(np.asarray(got - ref)))
    scale = np.max(np.abs(np.asarray(ref))) + 1e-6
    assert err / scale < 2e-2, (err, scale)


def test_tconv3_matches_lax():
    rng = np.random.default_rng(2)
    x5 = jnp.asarray(rng.standard_normal((2, 7, 4, 4, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 1, 1, 16, 24)) * 0.1, jnp.float32)
    ref = _ref_tconv(x5, w)
    got = C.tconv3_stack3(x5, w)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_quantconv_dispatches_temporal_stack3(monkeypatch):
    """QuantConv routes small-row (3,1,1) convs to stack3 and matches nn.Conv."""
    from flax import linen as nn
    from mvoc_tpu.ops.quantize import QuantConv

    monkeypatch.delenv("MVOC_TCONV_IMPL", raising=False)
    rng = np.random.default_rng(3)
    x5 = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 16)), jnp.float32)
    kw = dict(features=16, kernel_size=(3, 1, 1),
              padding=((1, 1), (0, 0), (0, 0)), dtype=jnp.float32)
    qc = QuantConv(**kw)
    params = qc.init(jax.random.PRNGKey(0), x5)
    got = qc.apply(params, x5)
    ref = nn.Conv(**kw).apply(params, x5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # the dispatch really took the matmul form: its jaxpr has no conv primitive
    jxp = str(jax.make_jaxpr(lambda p, x: qc.apply(p, x))(params, x5))
    assert "conv_general_dilated" not in jxp
    # a large-row call stays on lax.conv (M > TCONV_STACK3_MAX_ROWS)
    xbig = jnp.asarray(rng.standard_normal((2, 16, 16, 16, 16)), jnp.float32)
    jxp_big = str(jax.make_jaxpr(lambda p, x: qc.apply(p, x))(params, xbig))
    assert "conv_general_dilated" in jxp_big


def test_temporal_dispatch_boundary(monkeypatch):
    """The rule is pinned to TCONV_STACK3_MAX_ROWS itself, not a copy of it.

    Probes M == threshold (dispatches) and M == threshold + 1 / 2x (does
    not), so a code/doc threshold mismatch or silent change moves this test.
    """
    monkeypatch.delenv("MVOC_TCONV_IMPL", raising=False)
    monkeypatch.delenv("MVOC_TCONV_ROWS", raising=False)
    thr = C.TCONV_STACK3_MAX_ROWS
    assert C.temporal_form(thr) is C.tconv3_stack3
    assert C.temporal_form(thr + 1) is None
    assert C.temporal_form(2 * thr) is None
    # frames beyond the probed range never dispatch (long64 regression)
    fmax = C.TCONV_STACK3_MAX_FRAMES
    assert C.temporal_form(thr, fmax) is C.tconv3_stack3
    assert C.temporal_form(thr, fmax + 1) is None
    assert C.temporal_form(1024, 64) is None
    # the env override used by on-chip A/Bs rebinds the threshold
    monkeypatch.setenv("MVOC_TCONV_ROWS", str(2 * thr))
    assert C.temporal_form(2 * thr) is C.tconv3_stack3
    assert C.temporal_form(2 * thr + 1) is None


def test_tconv_override_context(monkeypatch):
    """tconv_override beats the env/threshold rule inside its context only
    (the stage-keyed inversion-vs-composite dispatch)."""
    monkeypatch.delenv("MVOC_TCONV_IMPL", raising=False)
    monkeypatch.delenv("MVOC_TCONV_ROWS", raising=False)
    small = C.TCONV_STACK3_MAX_ROWS  # would dispatch under the rule
    assert C.temporal_form(small) is C.tconv3_stack3
    with C.tconv_override("xla"):
        assert C.temporal_form(small) is None
        with C.tconv_override("stack3"):
            assert C.temporal_form(10 ** 9) is C.tconv3_stack3
        assert C.temporal_form(small) is None
    assert C.temporal_form(small) is C.tconv3_stack3


def test_quantconv_spatial_winner_table(monkeypatch):
    """A SPATIAL_WINNERS entry routes that tier through the matmul form."""
    from flax import linen as nn
    from mvoc_tpu.ops.quantize import QuantConv

    monkeypatch.delenv("MVOC_CONV_IMPL", raising=False)
    monkeypatch.setitem(C.SPATIAL_WINNERS, (16, 8, 8), "wcat3")
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    kw = dict(features=24, kernel_size=(3, 3), padding=1, dtype=jnp.float32)
    qc = QuantConv(**kw)
    params = qc.init(jax.random.PRNGKey(0), x)
    got = qc.apply(params, x)
    ref = nn.Conv(**kw).apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    jxp = str(jax.make_jaxpr(lambda p, x: qc.apply(p, x))(params, x))
    assert "conv_general_dilated" not in jxp
    # strided / other-tier convs stay on lax.conv
    qs = QuantConv(features=24, kernel_size=(3, 3), strides=(2, 2),
                   padding=1, dtype=jnp.float32)
    ps = qs.init(jax.random.PRNGKey(0), x)
    jxp_s = str(jax.make_jaxpr(lambda p, x: qs.apply(p, x))(ps, x))
    assert "conv_general_dilated" in jxp_s


def test_tconv3_frame_boundaries_zero_padded():
    # single nonzero frame: its tap-0/tap-2 contributions land exactly one
    # frame later/earlier and nowhere else (catches shift-direction bugs)
    x5 = jnp.zeros((1, 5, 2, 2, 3), jnp.float32).at[:, 2].set(1.0)
    w = jnp.zeros((3, 1, 1, 3, 3), jnp.float32)
    w = w.at[0].set(jnp.eye(3) * 1.0)   # tap t=0: reads x[f-1]
    w = w.at[2].set(jnp.eye(3) * 10.0)  # tap t=2: reads x[f+1]
    got = np.asarray(C.tconv3_stack3(x5, w))
    ref = np.asarray(_ref_tconv(x5, w))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    # frame 3 sees tap0 (x[2]=1 -> 1.0); frame 1 sees tap2 (x[2] -> 10.0)
    assert np.allclose(got[0, 3], 1.0) and np.allclose(got[0, 1], 10.0)
    assert np.allclose(got[0, 0], 0.0) and np.allclose(got[0, 4], 0.0)
