"""Tests for the analytic flops accounting (utils/flops.py).

Pins the two XLA cost-analysis holes that motivated the module (scan bodies
counted once; pallas kernels counted zero) and the closed-form correctness
of the StableHLO walk on known shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mvoc_tpu.utils import flops as FL


def test_dot_flops_closed_form():
    m, k, n = 32, 64, 16
    f = lambda a, b: a @ b
    got = FL.matmul_flops(f, jnp.zeros((m, k)), jnp.zeros((k, n)))
    assert got == 2 * m * k * n


def test_conv_flops_closed_form():
    x = jnp.zeros((2, 8, 8, 4))
    w = jnp.zeros((3, 3, 4, 6))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    f = lambda a, b: jax.lax.conv_general_dilated(
        a, b, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
    got = FL.matmul_flops(f, x, w)
    assert got == 2 * 2 * 8 * 8 * 6 * (3 * 3 * 4)


def test_scan_body_counted_once_by_design_doc():
    """The documented XLA hole: a 5-trip scan reports the same cost as one
    body.  (This pins the *reason* bench composes per-forward counts
    explicitly instead of tracing scanned steps.)"""
    w = jnp.zeros((16, 16))

    def one(x):
        return x @ w

    def scanned(x):
        x, _ = jax.lax.scan(lambda c, _: (one(c), None), x, None, length=5)
        return x

    x = jnp.zeros((4, 16))
    f1 = FL.matmul_flops(one, x)
    f5 = FL.matmul_flops(scanned, x)
    assert f1 == 2 * 4 * 16 * 16
    # the walk sees the body once — callers must multiply by trip count
    assert f5 == f1


def test_forward_flops_counts_attention_on_either_dispatch():
    """The same sdpa call must produce the same total whether the dispatch
    picks the XLA einsum path (counted by the StableHLO walk) or the pallas
    kernel (counted by the tally stub)."""
    from mvoc_tpu.models import layers as L

    b, s, heads, d = 1, 256, 2, 64
    inner = heads * d
    q = jnp.zeros((b, s, inner), jnp.float32)

    def attn(q):
        return L.sdpa(q, q, q, heads)

    total = FL.forward_flops(attn, q)
    # analytic: QK^T + PV = 4*b*h*s*s*d, plus the zero projections (none
    # here: sdpa is called directly on q/k/v)
    expect = 4.0 * b * heads * s * s * d
    # the XLA path adds no other dots; allow small slack for masking ops
    assert total == pytest.approx(expect, rel=0.01)


def test_jaxpr_flops_scan_multiplies_by_trip_count():
    w = jnp.zeros((16, 16))

    def one(x):
        return x @ w

    def scanned(x):
        x, _ = jax.lax.scan(lambda c, _: (one(c), None), x, None, length=5)
        return x

    x = jnp.zeros((4, 16))
    assert FL.jaxpr_matmul_flops(one, x) == 2 * 4 * 16 * 16
    assert FL.jaxpr_matmul_flops(scanned, x) == 5 * 2 * 4 * 16 * 16


def test_jaxpr_flops_counts_pallas_kernel_body():
    """The flash kernel's in-kernel dot_generals must be counted x grid."""
    from mvoc_tpu.ops.attention import flash_attention

    b, h, s, d = 1, 2, 256, 64
    q = jnp.zeros((b, h, s, d), jnp.float32)
    got = FL.jaxpr_matmul_flops(
        lambda q, k, v: flash_attention(q, k, v, interpret=True), q, q, q)
    # QK^T + PV = 4*b*h*s*s*d (blocks exactly tile 256, no padding waste)
    assert got == 4 * b * h * s * s * d


def test_jaxpr_flops_conv_and_cond():
    x = jnp.zeros((2, 8, 8, 4))
    w = jnp.zeros((3, 3, 4, 6))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

    def f(x, w):
        conv = lambda: jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
        # cond: the counter takes the most expensive branch
        return jax.lax.cond(x.sum() > 0, conv, conv)

    got = FL.jaxpr_matmul_flops(f, x, w)
    assert got == 2 * 2 * 8 * 8 * 6 * (3 * 3 * 4)


def test_jaxpr_flops_by_class_splits_and_sums():
    """The per-class split (conv / dot / pallas) sums to the total walker,
    with each op landing in its own class."""
    from mvoc_tpu.ops.attention import flash_attention

    x = jnp.zeros((2, 8, 8, 4))
    w = jnp.zeros((3, 3, 4, 6))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    wd = jnp.zeros((16, 16))
    q = jnp.zeros((1, 2, 256, 64), jnp.float32)

    def f(x, w, xa, wd, q):
        c = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn)
        d = xa @ wd
        a = flash_attention(q, q, q, interpret=True)
        return c.sum() + d.sum() + a.sum()

    xa = jnp.zeros((4, 16))
    by = FL.jaxpr_matmul_flops_by_class(f, x, w, xa, wd, q)
    conv_want = 2 * 2 * 8 * 8 * 6 * (3 * 3 * 4)
    dot_want = 2 * 4 * 16 * 16
    pallas_want = 4 * 1 * 2 * 256 * 256 * 64
    assert by["conv"] == conv_want
    assert by["dot"] == dot_want
    assert by["pallas"] == pallas_want
    total = FL.jaxpr_matmul_flops(f, x, w, xa, wd, q)
    assert sum(by.values()) == total


def test_jaxpr_flops_by_class_scan_multiplies():
    w = jnp.zeros((16, 16))

    def scanned(x):
        x, _ = jax.lax.scan(lambda c, _: (c @ w, None), x, None, length=5)
        return x

    by = FL.jaxpr_matmul_flops_by_class(scanned, jnp.zeros((4, 16)))
    assert by == {"conv": 0.0, "dot": 5 * 2 * 4 * 16 * 16, "pallas": 0.0}


def test_forward_flops_tiny_unet_exceeds_matmul_only():
    """On the tiny UNet the attention tally must add to the conv/dot walk
    (and the composition must be deterministic across traces)."""
    from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet, UNetConfig

    cfg = UNetConfig.tiny()
    model = I2VGenXLUNet(cfg, dtype=jnp.float32)
    F, H, W = 4, 8, 8
    rng = np.random.default_rng(0)
    mk = lambda *sh: jnp.asarray(rng.standard_normal(sh), jnp.float32)
    inputs = dict(
        sample=mk(1, F, H, W, 4), timestep=jnp.asarray([981]),
        fps=jnp.asarray([8]), image_latents_first=mk(1, F, H, W, 4),
        image_latents=mk(1, F, H, W, 4),
        image_embeddings=mk(1, F, cfg.cross_attention_dim),
        encoder_hidden_states=mk(1, 7, cfg.cross_attention_dim))
    params = jax.eval_shape(lambda: model.init(jax.random.key(0), **inputs))

    def fwd(p):
        return model.apply(p, **inputs)

    total = FL.forward_flops(fwd, params)
    walk_only = FL.matmul_flops(fwd, params)
    assert total > 0 and walk_only > 0
    # deterministic
    assert FL.forward_flops(fwd, params) == total
