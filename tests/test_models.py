"""VAE + CLIP smoke/shape/consistency tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np

from mvoc_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextModel,
    CLIPVisionConfig,
    CLIPVisionModelWithProjection,
)
from mvoc_tpu.models.vae import AutoencoderKL, VAEConfig, sample_latents


def test_vae_roundtrip_shapes(rng):
    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg)
    x = jnp.asarray(rng.standard_normal((3, 16, 16, 3), dtype=np.float32))
    params = model.init(jax.random.key(0), x)
    mean, logvar = model.apply(params, x, method=AutoencoderKL.encode)
    assert mean.shape == (3, 8, 8, 4)  # one downsample in tiny config
    assert logvar.shape == mean.shape
    z = sample_latents(mean, logvar, jax.random.key(1))
    out = model.apply(params, z, method=AutoencoderKL.decode)
    assert out.shape == (3, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_vae_encode_deterministic_mode(rng):
    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3), dtype=np.float32))
    params = model.init(jax.random.key(0), x)
    m1, _ = model.apply(params, x, method=AutoencoderKL.encode)
    m2, _ = model.apply(params, x, method=AutoencoderKL.encode)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_vae_odd_input_size(rng):
    """720x1280 -> 90x160 latents: encoder must handle sizes with odd
    intermediate resolutions via the asymmetric right/bottom padding."""
    cfg = VAEConfig(block_out_channels=(8, 16, 16, 16), layers_per_block=1, norm_num_groups=4)
    model = AutoencoderKL(cfg)
    x = jnp.zeros((1, 24, 40, 3))  # /8 => 3x5
    params = model.init(jax.random.key(0), x)
    mean, _ = model.apply(params, x, method=AutoencoderKL.encode)
    assert mean.shape == (1, 3, 5, 4)


def test_clip_text_shapes_and_clip_skip(rng):
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 12)))
    params = model.init(jax.random.key(0), ids)
    out = model.apply(params, ids)
    assert out.shape == (2, 12, cfg.hidden_size)
    out_skip = model.apply(params, ids, clip_skip=1)
    assert np.abs(np.asarray(out) - np.asarray(out_skip)).max() > 1e-6


def test_clip_text_causality(rng):
    """Token t's embedding must not depend on tokens > t."""
    cfg = CLIPTextConfig.tiny()
    model = CLIPTextModel(cfg)
    ids = np.asarray(rng.integers(0, cfg.vocab_size, (1, 12)))
    params = model.init(jax.random.key(0), jnp.asarray(ids))
    out1 = np.asarray(model.apply(params, jnp.asarray(ids)))
    ids2 = ids.copy()
    ids2[0, -1] = (ids2[0, -1] + 1) % cfg.vocab_size
    out2 = np.asarray(model.apply(params, jnp.asarray(ids2)))
    np.testing.assert_allclose(out1[0, :-1], out2[0, :-1], atol=1e-6)
    assert np.abs(out1[0, -1] - out2[0, -1]).max() > 1e-6


def test_clip_vision_projection_shape(rng):
    cfg = CLIPVisionConfig.tiny()
    model = CLIPVisionModelWithProjection(cfg)
    px = jnp.asarray(rng.standard_normal((2, 28, 28, 3), dtype=np.float32))
    params = model.init(jax.random.key(0), px)
    emb = model.apply(params, px)
    assert emb.shape == (2, cfg.projection_dim)
    assert np.isfinite(np.asarray(emb)).all()


def test_tiled_decode_matches_full(rng):
    """Tiled VAE decode must equal the full decode away from seams and stay
    close at blended seams (conv receptive field causes tiny edge drift)."""
    from mvoc_tpu.models.vae import AutoencoderKL, VAEConfig, tiled_decode

    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg)
    z = jnp.asarray(rng.standard_normal((1, 16, 24, 4), dtype=np.float32))
    params = model.init(jax.random.key(0), jnp.zeros((1, 8, 8, 3)))

    def dec(zt):
        return model.apply(params, zt, method=AutoencoderKL.decode)

    full = np.asarray(dec(z))
    tiled = np.asarray(tiled_decode(dec, z, tile_latent=12, overlap_latent=4))
    assert tiled.shape == full.shape
    # tiles see different global GroupNorm/mid-attention statistics, so
    # outputs differ by design (diffusers tiled VAE behaves the same);
    # require strong structural agreement, not equality
    corr = np.corrcoef(tiled.ravel(), full.ravel())[0, 1]
    assert corr > 0.9, corr
    assert np.isfinite(tiled).all()
    # degenerate case: one tile covering everything IS the full decode
    one = np.asarray(tiled_decode(dec, z, tile_latent=24, overlap_latent=4))
    np.testing.assert_allclose(one, full, atol=1e-5)
