"""Real-checkpoint parity tests — auto-activate the moment weights land.

No I2VGen-XL checkpoint ships in this image (the one SURVEY.md item still
partial).  Without weights these tests now run in TINY SMOKE mode against
the random-weight tiny pipeline (the first-hour playbook's insurance: the
harness itself cannot decay — VERDICT r4 directive 8); weight-dependent
assertions (VAE round-trip PSNR, eps statistics bounds) apply only in
real mode.  Drop the diffusers checkpoint at ./checkpoints/i2vgen-xl (or
set MVOC_CHECKPOINT) and the same tests run the real thing — step 2 of
docs/FIRST_HOUR_WITH_WEIGHTS.md.  Reference loading site:
/root/reference/i2vgen-xl/inverse.py:113-118.  MVOC_CHECKPOINT=tiny
forces the smoke mode explicitly (playbook step 1-2 dry run).
"""

import os

import numpy as np
import pytest

CKPT = os.environ.get(
    "MVOC_CHECKPOINT",
    os.path.join(os.path.dirname(os.path.dirname(__file__)),
                 "checkpoints", "i2vgen-xl"))
REAL = CKPT != "tiny" and os.path.isdir(os.path.join(CKPT, "unet"))


@pytest.fixture(scope="module")
def real_pipe():
    if not REAL:
        from mvoc_tpu.utils.testing import build_tiny_pipeline

        return build_tiny_pipeline()
    import jax.numpy as jnp

    from mvoc_tpu.pipeline.i2vgen import I2VGenXLPipeline

    return I2VGenXLPipeline.from_pretrained(CKPT, dtype=jnp.float32)


def test_conversion_structural_and_activations(real_pipe):
    """Two-way structural conversion already ran inside from_pretrained
    (real mode); additionally every module must produce finite, sane
    activation stats on deterministic inputs
    (models/convert.verify_activations)."""
    from mvoc_tpu.models.convert import verify_activations

    stats = verify_activations(real_pipe)
    assert stats, "no modules verified"
    for name, (mean, std) in stats.items():
        assert np.isfinite(mean) and np.isfinite(std), f"{name} non-finite"
        assert abs(mean) < 1e3 and std < 1e4, f"{name} blown up: {mean}, {std}"


def test_real_unet_forward_finite(real_pipe):
    """One UNet forward at small latent size: finite output; with real
    weights additionally noise-prediction-scale statistics (a transposed
    weight shows up here as a blown-up or near-zero std)."""
    import jax
    import jax.numpy as jnp

    cfg = real_pipe.unet.config
    B, F, H, W = 1, 4, 16, 16
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    out = real_pipe.unet.apply(
        real_pipe.params["unet"],
        sample=mk(B, F, H, W, 4),
        timestep=jnp.asarray([500]),
        fps=jnp.asarray([8]),
        image_latents_first=mk(B, F, H, W, 4),
        image_latents=mk(B, F, H, W, 4),
        image_embeddings=mk(B, F, cfg.cross_attention_dim),
        encoder_hidden_states=mk(B, 77, cfg.cross_attention_dim),
    )
    out = np.asarray(jax.block_until_ready(out))
    assert out.shape == (B, F, H, W, 4)
    assert np.isfinite(out).all()
    if REAL:
        assert 0.05 < out.std() < 50.0, f"suspicious eps std {out.std()}"


def test_real_vae_roundtrip(real_pipe):
    """VAE encode->decode on a smooth test image.  Real-weight KL-VAE
    round-trip PSNR is well above 25 dB on natural images (a channel-order
    bug lands far below); the random-weight tiny VAE only smoke-checks the
    path end-to-end (finite, right shape)."""
    import jax.numpy as jnp

    from mvoc_tpu.utils.metrics import psnr

    h = w = 64 if REAL else 16
    yy, xx = np.mgrid[0:h, 0:w] / max(h, w)
    img = np.stack([yy, xx, (yy + xx) / 2], axis=-1).astype(np.float32)
    x = jnp.asarray(img[None] * 2.0 - 1.0)  # [-1, 1]
    mean, _logvar = real_pipe.vae.apply(real_pipe.params["vae"], x,
                                        method=type(real_pipe.vae).encode)
    rec = real_pipe.vae.apply(real_pipe.params["vae"], mean,
                              method=type(real_pipe.vae).decode)
    rec01 = (np.asarray(rec[0]) + 1.0) / 2.0
    assert rec01.shape == img.shape
    assert np.isfinite(rec01).all()
    if REAL:
        score = psnr(rec01[None], img[None])
        assert score > 25.0, f"VAE round-trip PSNR {score:.1f} dB"
