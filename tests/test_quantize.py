"""Unit tests for the int8 w8a8 primitives (ops/quantize.py).

CPU-only numerics: the int8 path must agree with the fp32 reference to
quantization noise (~1/127 per-tensor relative), quantize_params must hit
exactly the conv/dense kernel leaves, and QuantizedTensor must survive jit
boundaries as a pytree.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mvoc_tpu.ops import quantize as Q


def _rel_err(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    return np.abs(a - b).max() / (np.abs(b).max() + 1e-9)


def test_quantize_tensor_roundtrip_per_channel():
    rng = np.random.default_rng(0)
    # give channels wildly different ranges: per-channel scales must adapt
    w = rng.standard_normal((3, 3, 16, 8)).astype(np.float32)
    w *= (10.0 ** rng.uniform(-2, 2, size=8)).astype(np.float32)
    qt = Q.quantize_tensor(jnp.asarray(w), channel_axes=(3,))
    assert qt.data.dtype == jnp.int8
    assert qt.scale.shape == (1, 1, 1, 8)
    deq = np.asarray(qt.dequantize())
    # per-channel: every channel independently within 1/127 of its own max
    for c in range(8):
        err = np.abs(deq[..., c] - w[..., c]).max()
        assert err <= np.abs(w[..., c]).max() / 127 * 0.5 + 1e-7


def test_quantize_tensor_zero_channel_safe():
    w = jnp.zeros((4, 4))
    qt = Q.quantize_tensor(w, channel_axes=(1,))
    assert np.all(np.asarray(qt.dequantize()) == 0)
    assert np.all(np.isfinite(np.asarray(qt.scale)))


def test_int8_matmul_matches_fp32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((128, 32)), jnp.float32)
    ref = x @ w
    out = Q.int8_matmul(x, Q.quantize_tensor(w, (1,)), out_dtype=jnp.float32)
    # w8a8 error budget: ~2 quantization noises through a K=128 contraction
    assert _rel_err(out, ref) < 0.02


def test_int8_conv_matches_fp32():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 24)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 24, 12)), jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    ref = jax.lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                       dimension_numbers=dn)
    out = Q.int8_conv(x, Q.quantize_tensor(w, (3,)), strides=(1, 1),
                      padding=[(1, 1), (1, 1)], out_dtype=jnp.float32)
    assert out.shape == ref.shape
    assert _rel_err(out, ref) < 0.02


def test_int8_conv_strided():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)), jnp.float32)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    ref = jax.lax.conv_general_dilated(x, w, (2, 2), [(1, 1), (1, 1)],
                                       dimension_numbers=dn)
    out = Q.int8_conv(x, Q.quantize_tensor(w, (3,)), strides=(2, 2),
                      padding=[(1, 1), (1, 1)], out_dtype=jnp.float32)
    assert out.shape == ref.shape
    assert _rel_err(out, ref) < 0.02


def test_quantized_tensor_crosses_jit():
    rng = np.random.default_rng(4)
    w = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    qt = Q.quantize_tensor(w, (1,))

    @jax.jit
    def f(x, qt):
        return Q.int8_matmul(x, qt, out_dtype=jnp.float32)

    x = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    out = f(x, qt)
    assert _rel_err(out, x @ w) < 0.03


def test_quantize_params_hits_only_kernels():
    from flax import linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), name="conv")(x)
            x = nn.GroupNorm(num_groups=4, name="gn")(x)
            return nn.Dense(4, name="dense")(x)

    m = M()
    params = m.init(jax.random.key(0), jnp.ones((1, 8, 8, 4)))
    qp = Q.quantize_params(params)
    p = qp["params"]
    assert isinstance(p["conv"]["kernel"], Q.QuantizedTensor)
    assert isinstance(p["dense"]["kernel"], Q.QuantizedTensor)
    # biases and norm scales untouched
    assert not isinstance(p["conv"]["bias"], Q.QuantizedTensor)
    assert not isinstance(p["gn"]["scale"], Q.QuantizedTensor)
    assert not isinstance(p["gn"]["bias"], Q.QuantizedTensor)


@pytest.mark.parametrize("kshape,kw", [
    ((3, 3), dict(padding=1)),                                  # resnet conv
    ((1, 1), dict()),                                           # shortcut
    ((3, 3), dict(strides=(2, 2), padding=1)),                  # downsample
    ((3, 1, 1), dict(padding=((1, 1), (0, 0), (0, 0)))),        # temporal
])
def test_quantconv_exact_path_bitwise(kshape, kw, monkeypatch):
    """With the matmul-form dispatch off, plain-array kernels go through the
    STOCK nn.Conv computation — bitwise — so swapping nn.Conv -> QuantConv
    in the model changes nothing until quantize_params is applied.  (With
    dispatch on, hot shapes route to the exact matmul forms instead —
    allclose-parity + jaxpr-dispatch pinned in tests/test_conv_forms.py.)"""
    from flax import linen as nn

    monkeypatch.setenv("MVOC_CONV_IMPL", "xla")
    monkeypatch.setenv("MVOC_TCONV_IMPL", "xla")
    rng = np.random.default_rng(0)
    nd = len(kshape)
    x = jnp.asarray(rng.standard_normal((2, *([8] * nd), 6)), jnp.bfloat16)
    ref_m = nn.Conv(6, kshape, dtype=jnp.bfloat16, **kw)
    q_m = Q.QuantConv(6, kshape, dtype=jnp.bfloat16, **kw)
    params = ref_m.init(jax.random.key(0), x)
    ref = ref_m.apply(params, x)
    out = q_m.apply(params, x)
    assert out.dtype == ref.dtype and bool(jnp.all(out == ref))


def test_quantdense_exact_path_bitwise():
    from flax import linen as nn

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 16)), jnp.bfloat16)
    for kw in [dict(), dict(use_bias=False)]:
        ref_m = nn.Dense(8, dtype=jnp.bfloat16, **kw)
        q_m = Q.QuantDense(8, dtype=jnp.bfloat16, **kw)
        params = ref_m.init(jax.random.key(0), x)
        assert bool(jnp.all(q_m.apply(params, x) == ref_m.apply(params, x)))


@pytest.mark.parametrize("kshape,kw", [
    ((3, 3), dict(padding=1)),
    ((3, 3), dict(strides=(2, 2), padding=1)),
    ((3, 1, 1), dict(padding=((1, 1), (0, 0), (0, 0)))),
])
def test_quantconv_quantized_path_close(kshape, kw):
    from flax import linen as nn

    rng = np.random.default_rng(1)
    nd = len(kshape)
    x = jnp.asarray(rng.standard_normal((2, *([8] * nd), 6)), jnp.float32)
    m = Q.QuantConv(6, kshape, dtype=jnp.float32, **kw)
    params = m.init(jax.random.key(0), x)
    ref = m.apply(params, x)
    out = jax.jit(m.apply)(Q.quantize_params(params), x)
    assert out.shape == ref.shape
    assert _rel_err(out, ref) < 0.03


def test_quantdense_quantized_path_close():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    m = Q.QuantDense(8, dtype=jnp.float32)
    params = m.init(jax.random.key(0), x)
    ref = m.apply(params, x)
    out = jax.jit(m.apply)(Q.quantize_params(params), x)
    assert _rel_err(out, ref) < 0.03


def _tiny_unet_setup():
    from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet, UNetConfig

    cfg = UNetConfig.tiny()
    model = I2VGenXLUNet(cfg, dtype=jnp.float32)
    F, H, W = 4, 8, 8
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    inputs = dict(
        sample=mk(1, F, H, W, 4), timestep=jnp.asarray([981]),
        fps=jnp.asarray([8]), image_latents_first=mk(1, F, H, W, 4),
        image_latents=mk(1, F, H, W, 4),
        image_embeddings=mk(1, F, cfg.cross_attention_dim),
        encoder_hidden_states=mk(1, 7, cfg.cross_attention_dim))
    params = model.init(jax.random.key(0), **inputs)
    return model, params, inputs


def test_tiny_unet_int8_forward_bounded_drift():
    """End-to-end: the tiny UNet with int8-quantized params runs under jit
    and stays close to the exact forward (w8a8 noise compounds through ~10
    quantized matmuls; the bound is loose but a wrong wiring — swapped
    scales, missed dequant — lands orders of magnitude outside it)."""
    model, params, inputs = _tiny_unet_setup()
    exact = model.apply(params, **inputs)
    qp = jax.jit(lambda p: Q.quantize_params(
        p, predicate=Q.default_unet_predicate))(params)
    out = jax.jit(lambda p: model.apply(p, **inputs))(qp)
    assert out.shape == exact.shape
    err = _rel_err(out, exact)
    assert 1e-5 < err < 0.15, err  # differs (really quantized), bounded


def test_tiny_unet_int8_skips_anchor_layers():
    """default_unet_predicate keeps the eps-anchoring layers (time/fps
    embeddings, conv_out) and the tiny-contraction boundary convs
    (conv_in, image-latents projections) in fp; the bulk quantizes."""
    _, params, _ = _tiny_unet_setup()
    qp = Q.quantize_params(params, predicate=Q.default_unet_predicate)
    p = qp["params"]
    for skipped in (p["time_embedding"]["linear_1"]["kernel"],
                    p["conv_out"]["kernel"], p["conv_in"]["kernel"]):
        assert not isinstance(skipped, Q.QuantizedTensor)
    assert isinstance(
        p["down_blocks_0"]["resnets_0"]["conv1"]["kernel"], Q.QuantizedTensor)
    assert isinstance(
        p["transformer_in"]["transformer_blocks_0"]["attn1"]["to_q"]["kernel"],
        Q.QuantizedTensor)


def test_quantize_params_predicate():
    from flax import linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(2, name="skip_me")(nn.Dense(4, name="q_me")(x))

    params = M().init(jax.random.key(0), jnp.ones((1, 8)))
    qp = Q.quantize_params(
        params, predicate=lambda names: "skip_me" not in names)
    assert isinstance(qp["params"]["q_me"]["kernel"], Q.QuantizedTensor)
    assert not isinstance(qp["params"]["skip_me"]["kernel"], Q.QuantizedTensor)


def test_mixed_predicate_selects_measured_winners():
    """mixed_unet_predicate ships the r5 probe's int8 boundary exactly:
    deep-tier (K>=1280) dense GEMMs and deep (3,1,1) temporal convs
    quantize; thin-K denses, spatial convs, and the anchor skip-list stay
    bf16 (TPU_RUNS_r05.log s8_gemm_probe_final)."""
    mk = lambda *s: jnp.zeros(s, jnp.float32)
    names = ("up_blocks_1", "ff", "kernel")
    # dense [K, N]: 1280-tier in/out win, 320-tier loses
    assert Q.mixed_unet_predicate(names, mk(1280, 10240))
    assert Q.mixed_unet_predicate(names, mk(5120, 1280))
    assert not Q.mixed_unet_predicate(names, mk(320, 2560))
    assert not Q.mixed_unet_predicate(names, mk(640, 5120))
    # (3,1,1) temporal conv at C>=1280 wins (s8 stack3 dot, 5.0x); spatial
    # 3x3 and shallow temporal stay bf16
    assert Q.mixed_unet_predicate(names, mk(3, 1, 1, 1280, 1280))
    assert not Q.mixed_unet_predicate(names, mk(3, 1, 1, 320, 320))
    assert not Q.mixed_unet_predicate(names, mk(3, 3, 1280, 1280))
    # anchor skip-list still wins over shape
    assert not Q.mixed_unet_predicate(("conv_out", "kernel"), mk(1280, 1280))


def test_quantize_params_shape_aware_predicate():
    """quantize_params accepts 2-arg (names, leaf) predicates; the mixed
    selection leaves sub-tier kernels as PLAIN arrays so those layers keep
    the bitwise-exact bf16 dispatch."""
    from flax import linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(8, name="deep")(nn.Dense(1280, name="thin")(x))

    params = M().init(jax.random.key(0), jnp.ones((1, 64)))
    qp = Q.quantize_params(params, predicate=Q.mixed_unet_predicate)
    # thin: K=64 < 1280 -> plain; deep: K=1280 -> quantized
    assert not isinstance(qp["params"]["thin"]["kernel"], Q.QuantizedTensor)
    assert isinstance(qp["params"]["deep"]["kernel"], Q.QuantizedTensor)


def test_quantconv_tconv_s8_stack3_dispatch_and_envelope(monkeypatch):
    """The quantized (3,1,1) conv dispatches the s8 stack3 GEMM inside the
    probed M/F envelope WITHOUT MVOC_S8_IMPL set (the XLA int8 dot is the
    probe-decided default), and falls back to int8_conv outside it.  Both
    paths approximate the same f32 conv; they differ bitwise (per-row vs
    per-sample activation scales), which is what detects the dispatch."""
    from flax import linen as nn

    monkeypatch.delenv("MVOC_S8_IMPL", raising=False)
    rng = np.random.default_rng(7)
    x5 = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 16)), jnp.float32)
    kw = dict(features=16, kernel_size=(3, 1, 1), use_bias=False,
              padding=((1, 1), (0, 0), (0, 0)), dtype=jnp.float32)
    m = Q.QuantConv(**kw)
    params = m.init(jax.random.key(0), x5)
    qp = Q.quantize_params(params)
    wq = qp["params"]["kernel"]
    exact = nn.Conv(**kw).apply(params, x5)

    in_env = m.apply(qp, x5)                       # M=64 <= threshold
    np.testing.assert_allclose(
        np.asarray(in_env),
        np.asarray(Q.int8_tconv_stack3(x5, wq, out_dtype=jnp.float32)),
        atol=1e-5)
    monkeypatch.setenv("MVOC_TCONV_ROWS", "32")    # force envelope miss
    out_env = m.apply(qp, x5)
    np.testing.assert_allclose(
        np.asarray(out_env),
        np.asarray(Q.int8_conv(x5, wq, strides=(1, 1, 1),
                               padding=((1, 1), (0, 0), (0, 0)),
                               out_dtype=jnp.float32)),
        atol=1e-5)
    for y in (in_env, out_env):
        assert _rel_err(y, exact) < 0.05
    assert not np.array_equal(np.asarray(in_env), np.asarray(out_env))
