"""Parity of the Pallas s8 GEMM (ops/s8gemm.py) against the XLA int8 dot.

Both compute s8 x s8 -> s32 exactly (integer accumulation is exact), then
the same f32 dequant — so parity is exact up to the final-dtype rounding.
Runs in interpret mode on CPU (MVOC_PALLAS_INTERPRET, set here).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("MVOC_PALLAS_INTERPRET", "1")


def _ref(xq, wq, sx, sw, out_dtype=jnp.float32):
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32)
            * (sx.reshape(-1, 1) * sw.reshape(1, -1))).astype(out_dtype)


@pytest.mark.parametrize("m,k,n,blocks", [
    (32, 64, 48, dict(bm=16, bn=16, bk=16)),    # multi-block all axes
    (17, 33, 9, dict(bm=16, bn=16, bk=16)),     # ragged: padding path
    (8, 16, 8, dict()),                          # single block (clamped)
])
def test_s8_matmul_matches_xla_int8(m, k, n, blocks):
    from mvoc_tpu.ops.s8gemm import s8_matmul

    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    sx = jnp.asarray(rng.uniform(0.01, 0.1, (m,)), jnp.float32)
    sw = jnp.asarray(rng.uniform(0.01, 0.1, (n,)), jnp.float32)
    got = s8_matmul(xq, wq, sx, sw, out_dtype=jnp.float32, **blocks)
    ref = _ref(xq, wq, sx, sw)
    assert got.shape == (m, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def test_int8_matmul_pallas_dispatch(monkeypatch):
    """MVOC_S8_IMPL=pallas routes int8_matmul through the kernel with
    identical results (incl. a leading batch axis that gets flattened)."""
    from mvoc_tpu.ops.quantize import int8_matmul, quantize_tensor

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 8, 40)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((40, 24)) * 0.1, jnp.float32)
    wq = quantize_tensor(w, channel_axes=(1,))
    monkeypatch.delenv("MVOC_S8_IMPL", raising=False)
    want = int8_matmul(x, wq, out_dtype=jnp.float32)
    monkeypatch.setenv("MVOC_S8_IMPL", "pallas")
    got = int8_matmul(x, wq, out_dtype=jnp.float32)
    assert got.shape == want.shape == (3, 8, 24)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_int8_tconv_stack3_close_to_int8_conv(monkeypatch):
    """The pallas-s8 temporal conv (matmul form, per-row act scales) must
    land in the same approximation class as int8_conv (per-sample scales):
    both approximate the f32 conv, with the stack3 form at least as close
    (finer activation scales)."""
    from flax import linen as nn

    from mvoc_tpu.ops.quantize import (QuantConv, int8_tconv_stack3,
                                       quantize_tensor)

    rng = np.random.default_rng(3)
    x5 = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 16)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 1, 1, 16, 16)) * 0.1, jnp.float32)
    wq = quantize_tensor(w, channel_axes=(4,))
    got = int8_tconv_stack3(x5, wq, out_dtype=jnp.float32)
    kw = dict(features=16, kernel_size=(3, 1, 1), use_bias=False,
              padding=((1, 1), (0, 0), (0, 0)), dtype=jnp.float32)
    exact = nn.Conv(**kw).apply({"params": {"kernel": w}}, x5)
    assert got.shape == exact.shape
    rel = float(jnp.linalg.norm(got - exact) / jnp.linalg.norm(exact))
    assert rel < 0.05, rel  # int8 quantization noise, not a wiring bug

    # QuantConv dispatches this path under MVOC_S8_IMPL=pallas
    monkeypatch.setenv("MVOC_S8_IMPL", "pallas")
    qc = QuantConv(**kw)
    y = qc.apply({"params": {"kernel": wq}}, x5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(got), atol=1e-5)


def test_s8_matmul_quantdense_contract():
    """End-to-end against int8_matmul (the QuantDense path): quantize a
    real-valued activation+weight pair the production way, then both GEMMs
    must agree exactly (same integers, same scales)."""
    from mvoc_tpu.ops.quantize import (_quantize_activation, int8_matmul,
                                       quantize_tensor)
    from mvoc_tpu.ops.s8gemm import s8_matmul

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((24, 40)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((40, 56)) * 0.1, jnp.float32)
    wq = quantize_tensor(w, channel_axes=(1,))
    want = int8_matmul(x, wq, out_dtype=jnp.float32)
    xq, sx = _quantize_activation(x, reduce_axes=(1,))
    got = s8_matmul(xq, wq.data, sx[:, 0], wq.scale.reshape(-1),
                    out_dtype=jnp.float32, bm=16, bn=16, bk=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
