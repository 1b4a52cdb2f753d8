"""Layer semantics vs torch ground truth (torch CPU is available in CI).

These pin the numerical semantics that matter for checkpoint fidelity:
GroupNorm reduction axes (4D per-frame and 5D joint-temporal), LayerNorm,
exact-gelu GEGLU, scaled-dot-product attention, nearest interpolation, and
torch AdaptiveAvgPool2d bin edges.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mvoc_tpu.models import layers


def test_groupnorm_4d_matches_torch(rng):
    x = rng.standard_normal((6, 5, 7, 16), dtype=np.float32)  # [BF,H,W,C]
    gn = layers.GroupNorm(num_groups=4, epsilon=1e-5)
    params = gn.init(jax.random.key(0), jnp.asarray(x))
    scale = rng.standard_normal(16).astype(np.float32)
    bias = rng.standard_normal(16).astype(np.float32)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    out = gn.apply(params, jnp.asarray(x))

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    ref = F.group_norm(xt, 4, torch.from_numpy(scale), torch.from_numpy(bias), 1e-5)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_groupnorm_5d_matches_torch(rng):
    """The temporal transformer normalizes the joint [B,C,F,H,W] tensor —
    statistics span frames too (see TransformerTemporalModel)."""
    x = rng.standard_normal((2, 4, 5, 7, 16), dtype=np.float32)  # [B,F,H,W,C]
    gn = layers.GroupNorm(num_groups=4, epsilon=1e-6)
    params = {"params": {"scale": jnp.ones(16), "bias": jnp.zeros(16)}}
    out = gn.apply(params, jnp.asarray(x))

    xt = torch.from_numpy(x).permute(0, 4, 1, 2, 3)  # [B,C,F,H,W]
    ref = F.group_norm(xt, 4, torch.ones(16), torch.zeros(16), 1e-6)
    ref = ref.permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_groupnorm_large_mean_no_cancellation(rng):
    """Activations with |mean| >> std (seen with real checkpoints) must not
    lose the variance to cancellation.  The one-pass E[x^2]-E[x]^2 form fails
    this (fp32 keeps ~7 digits; mean 1e3 / std 1e-2 leaves zero of the
    variance; its output error here is O(1)); the two-pass centered form
    stays within fp32 mean-summation rounding (~2e-2 at this 1e5 ratio)."""
    base = rng.standard_normal((4, 9, 9, 16)).astype(np.float32)
    x = (base * 1e-2 + 1e3).astype(np.float32)
    gn = layers.GroupNorm(num_groups=4, epsilon=1e-5)
    params = {"params": {"scale": jnp.ones(16), "bias": jnp.zeros(16)}}
    out = gn.apply(params, jnp.asarray(x))

    xt = torch.from_numpy(x).double().permute(0, 3, 1, 2)
    ref = F.group_norm(xt, 4, torch.ones(16, dtype=torch.float64),
                       torch.zeros(16, dtype=torch.float64), 1e-5)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-2)
    # the cancellation failure mode specifically: normalized group std stays
    # O(1) (one-pass cancellation clamps var to ~0 -> rsqrt(eps) -> std ~3e2;
    # fp32 mean rounding leaves a benign ~5% scale wobble here)
    og = np.asarray(out, dtype=np.float64).reshape(4, -1, 4, 4)
    np.testing.assert_allclose(og.std(axis=(1, 3)), 1.0, atol=0.1)


def test_layernorm_matches_torch(rng):
    x = rng.standard_normal((3, 11, 32), dtype=np.float32)
    ln = layers.LayerNorm()
    scale = rng.standard_normal(32).astype(np.float32)
    bias = rng.standard_normal(32).astype(np.float32)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    out = ln.apply(params, jnp.asarray(x))
    ref = F.layer_norm(torch.from_numpy(x), (32,), torch.from_numpy(scale),
                       torch.from_numpy(bias), 1e-5).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_sdpa_matches_torch(rng):
    q = rng.standard_normal((2, 9, 24), dtype=np.float32)
    k = rng.standard_normal((2, 13, 24), dtype=np.float32)
    v = rng.standard_normal((2, 13, 24), dtype=np.float32)
    out = layers.sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads=4)

    def split(x):
        b, s, c = x.shape
        return torch.from_numpy(x).reshape(b, s, 4, c // 4).transpose(1, 2)

    ref = F.scaled_dot_product_attention(split(q), split(k), split(v))
    ref = ref.transpose(1, 2).reshape(2, 9, 24).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_geglu_exact_gelu(rng):
    x = rng.standard_normal((2, 3, 8), dtype=np.float32)
    ff = layers.FeedForward(dim=8)
    params = ff.init(jax.random.key(0), jnp.asarray(x))
    out = ff.apply(params, jnp.asarray(x))
    # torch reference with the same weights
    w0 = np.asarray(params["params"]["net_0_proj"]["kernel"])
    b0 = np.asarray(params["params"]["net_0_proj"]["bias"])
    w2 = np.asarray(params["params"]["net_2"]["kernel"])
    b2 = np.asarray(params["params"]["net_2"]["bias"])
    h = torch.from_numpy(x) @ torch.from_numpy(w0) + torch.from_numpy(b0)
    a, gate = h.chunk(2, dim=-1)
    h = a * F.gelu(gate, approximate="none")
    ref = (h @ torch.from_numpy(w2) + torch.from_numpy(b2)).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_upsample_nearest_matches_torch(rng):
    """Covers both exact x2 and the odd-size path (12 -> 23)."""
    from mvoc_tpu.models.unet_i2vgen import _adaptive_avg_pool2d  # noqa: F401

    x = rng.standard_normal((1, 12, 20, 3), dtype=np.float32)
    for target in [(24, 40), (23, 45)]:
        ys = (np.arange(target[0]) * (12 / target[0])).astype(np.int64)
        xs = (np.arange(target[1]) * (20 / target[1])).astype(np.int64)
        ours = x[:, ys][:, :, xs]
        ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=target, mode="nearest")
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref)


def test_adaptive_avg_pool_matches_torch(rng):
    from mvoc_tpu.models.unet_i2vgen import _adaptive_avg_pool2d

    for h, w in [(90, 160), (8, 8), (33, 47)]:
        x = rng.standard_normal((2, h, w, 5), dtype=np.float32)
        out = _adaptive_avg_pool2d(jnp.asarray(x), (32, 32))
        ref = F.adaptive_avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), (32, 32))
        ref = ref.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_temporal_conv_is_identity_at_init(rng):
    """conv4 is zero-initialized, so a freshly initialized TemporalConvLayer
    must be the identity (diffusers zero-inits the same way)."""
    x = rng.standard_normal((8, 6, 6, 16), dtype=np.float32)  # [B*F,H,W,C], F=4
    layer = layers.TemporalConvLayer(in_dim=16, groups=4)
    params = layer.init(jax.random.key(0), jnp.asarray(x), 4)
    out = layer.apply(params, jnp.asarray(x), 4)
    np.testing.assert_allclose(np.asarray(out), x, atol=1e-6)


def test_timestep_embedding_matches_diffusers_formula():
    t = jnp.asarray([0, 1, 500, 999])
    emb = layers.timestep_embedding(t, 320)
    assert emb.shape == (4, 320)
    # flip_sin_to_cos=True: first half cos, second half sin
    half = np.exp(-np.log(10000) * np.arange(160) / 160.0)
    ref = np.concatenate([np.cos(999 * half), np.sin(999 * half)])
    # fp32 sin/cos of ~1000-radian arguments carries ~1e-3 noise vs fp64;
    # torch computes the same embedding in fp32, so fp32 is the parity dtype.
    np.testing.assert_allclose(np.asarray(emb[3]), ref, atol=5e-3)


def test_windowed_temporal_attention_locality(rng):
    """window=F reproduces full attention; small window localizes influence:
    perturbing frame 0 must not change frames beyond window//2."""
    import jax
    from mvoc_tpu.models.layers import TransformerTemporalModel

    F_, H_, W_, C = 8, 2, 2, 8
    x = rng.standard_normal((F_, H_, W_, C), dtype=np.float32)

    full = TransformerTemporalModel(C, heads=2, dim_head=4, norm_num_groups=4)
    params = full.init(jax.random.key(0), jnp.asarray(x), F_)
    out_full = full.apply(params, jnp.asarray(x), F_)

    same = TransformerTemporalModel(C, heads=2, dim_head=4, norm_num_groups=4, window=F_)
    out_same = same.apply(params, jnp.asarray(x), F_)
    np.testing.assert_allclose(np.asarray(out_same), np.asarray(out_full), atol=1e-6)

    # locality at the attention level (bypassing the frame-spanning
    # GroupNorm): with a band mask, a key/value perturbation in frame 0
    # cannot reach queries beyond window//2.
    window = 2
    idx = np.arange(F_)
    band = jnp.asarray(np.abs(idx[:, None] - idx[None, :]) <= window // 2)
    q = rng.standard_normal((1, F_, C), dtype=np.float32)
    kv1 = rng.standard_normal((1, F_, C), dtype=np.float32)
    kv2 = kv1.copy()
    kv2[0, 0] += 5.0
    o1 = np.asarray(layers.sdpa(jnp.asarray(q), jnp.asarray(kv1), jnp.asarray(kv1), 2, mask=band))
    o2 = np.asarray(layers.sdpa(jnp.asarray(q), jnp.asarray(kv2), jnp.asarray(kv2), 2, mask=band))
    assert np.abs(o2[0, :2] - o1[0, :2]).max() > 1e-3  # frames 0-1 see it
    np.testing.assert_array_equal(o2[0, 2:], o1[0, 2:])  # frames 2+ cannot


def _naive_frame_attention(q, k, v, heads, mask=None):
    """Per-head reference for sdpa_frames: [B, F, S, H*D] frame-axis attention."""
    b, f, s, inner = q.shape
    d = inner // heads
    qh = q.reshape(b, f, s, heads, d)
    kh = k.reshape(b, f, s, heads, d)
    vh = v.reshape(b, f, s, heads, d)
    logits = np.einsum("bfshd,bgshd->bhfgs", qh, kh) / np.sqrt(d)
    if mask is not None:
        logits = np.where(np.asarray(mask)[None, None, :, :, None], logits, -1e30)
    logits = logits - logits.max(axis=3, keepdims=True)
    p = np.exp(logits)
    p = p / p.sum(axis=3, keepdims=True)
    out = np.einsum("bhfgs,bgshd->bfshd", p, vh)
    return out.reshape(b, f, s, inner)


@pytest.mark.parametrize("heads,f", [(5, 16), (10, 16), (2, 8), (4, 64)])
def test_frame_attention_kernel_matches_naive(rng, heads, f):
    """The Pallas merged-head frame-attention kernel (block-diagonal bias,
    interpret mode on CPU) is exact per-head attention — pinned against a
    naive per-head numpy reference at the real UNet head counts."""
    from mvoc_tpu.ops import attention as flash

    d, s = 8, 24
    q = rng.standard_normal((2, f, s, heads * d), dtype=np.float32)
    k = rng.standard_normal((2, f, s, heads * d), dtype=np.float32)
    v = rng.standard_normal((2, f, s, heads * d), dtype=np.float32)
    g = layers._head_group_size(heads, f)
    assert g > 1  # the merged kernel path applies at these geometries
    out = flash.frame_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), f, heads,
        layers._block_diag_bias(f, g, None), interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), _naive_frame_attention(q, k, v, heads), atol=2e-5)


def test_frame_attention_kernel_windowed(rng):
    """Kernel with a [F, F] band mask folded into the bias == naive
    reference with the same mask (the long-video windowed configuration)."""
    from mvoc_tpu.ops import attention as flash

    heads, f, d, s = 4, 16, 8, 16
    idx = np.arange(f)
    band = jnp.asarray(np.abs(idx[:, None] - idx[None, :]) <= 2)
    q = rng.standard_normal((1, f, s, heads * d), dtype=np.float32)
    k = rng.standard_normal((1, f, s, heads * d), dtype=np.float32)
    v = rng.standard_normal((1, f, s, heads * d), dtype=np.float32)
    g = layers._head_group_size(heads, f)
    out = flash.frame_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), f, heads,
        layers._block_diag_bias(f, g, band), interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), _naive_frame_attention(q, k, v, heads, mask=band),
        atol=2e-5)


def test_frame_attention_kernel_sf_layout(rng):
    """sf_layout ([S, F, C] rows — the standard temporal token layout) ==
    torch SDPA per row."""
    from mvoc_tpu.ops import attention as flash

    heads, f, d = 10, 16, 8
    q = rng.standard_normal((24, f, heads * d), dtype=np.float32)
    k = rng.standard_normal((24, f, heads * d), dtype=np.float32)
    v = rng.standard_normal((24, f, heads * d), dtype=np.float32)
    g = layers._head_group_size(heads, f)
    out = flash.frame_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), f, heads,
        layers._block_diag_bias(f, g, None), sf_layout=True, interpret=True)

    def split(x):
        b, s, c = x.shape
        return torch.from_numpy(x).reshape(b, s, heads, d).transpose(1, 2)

    ref = F.scaled_dot_product_attention(split(q), split(k), split(v))
    ref = ref.transpose(1, 2).reshape(24, f, heads * d).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def test_sdpa_frames_matches_naive(rng):
    """The XLA sdpa_frames fallback (CPU path) == naive per-head reference."""
    heads, f, d, s = 5, 16, 8, 6
    q = rng.standard_normal((2, f, s, heads * d), dtype=np.float32)
    k = rng.standard_normal((2, f, s, heads * d), dtype=np.float32)
    v = rng.standard_normal((2, f, s, heads * d), dtype=np.float32)
    out = layers.sdpa_frames(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), heads)
    np.testing.assert_allclose(
        np.asarray(out), _naive_frame_attention(q, k, v, heads), atol=2e-5)


def test_feedforward_chunking_exact(rng, monkeypatch):
    """Row-chunked GEGLU == unchunked (chunking engages only past the byte
    threshold; forced small here to exercise the chunked path)."""
    monkeypatch.setattr(layers.FeedForward, "CHUNK_BYTE_THRESHOLD", 1)
    x = rng.standard_normal((4, 10, 8), dtype=np.float32)
    ff_chunked = layers.FeedForward(dim=8, chunk_rows=16)
    ff_plain = layers.FeedForward(dim=8, chunk_rows=0)
    params = ff_plain.init(jax.random.key(0), jnp.asarray(x))
    out_plain = ff_plain.apply(params, jnp.asarray(x))
    out_chunked = ff_chunked.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out_chunked), np.asarray(out_plain),
                               atol=1e-6)


def test_frame_attention_kernel_bf16(rng):
    """bf16 inputs: fp32 softmax statistics inside the kernel keep the
    output within bf16-rounding distance of the fp32 naive reference."""
    from mvoc_tpu.ops import attention as flash

    heads, f, d, s = 5, 16, 8, 16
    q = rng.standard_normal((1, f, s, heads * d), dtype=np.float32)
    k = rng.standard_normal((1, f, s, heads * d), dtype=np.float32)
    v = rng.standard_normal((1, f, s, heads * d), dtype=np.float32)
    g = layers._head_group_size(heads, f)
    out = flash.frame_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), f, heads,
        layers._block_diag_bias(f, g, None), interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _naive_frame_attention(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               atol=0.06, rtol=0.05)
