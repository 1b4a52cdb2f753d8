"""Tiny randomly-initialized pipeline for tests/CI — no multi-GB checkpoint
needed (SURVEY.md §7.8: 'test harness with tiny randomly-initialized UNet
config for CI').  Also used by __graft_entry__.dryrun_multichip and as the
shape template for sharding tests."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mvoc_tpu.models.clip import (
    CLIPTextConfig,
    CLIPTextModel,
    CLIPVisionConfig,
    CLIPVisionModelWithProjection,
)
from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet, UNetConfig
from mvoc_tpu.models.vae import AutoencoderKL, VAEConfig
from mvoc_tpu.ops.ddim import SchedulerConfig
from mvoc_tpu.pipeline.i2vgen import I2VGenXLPipeline

# tiny geometry: 16x16 px -> 8x8 latents (VAE /2), F frames
TINY_HW = 16
TINY_FRAMES = 2


class DummyTokenizer:
    """Hash-based stand-in for CLIPTokenizer with the same call contract."""

    def __init__(self, vocab_size: int, model_max_length: int):
        self.vocab_size = vocab_size
        self.model_max_length = model_max_length

    def __call__(self, texts, padding=None, max_length=None, truncation=True,
                 return_tensors="np"):
        max_length = max_length or self.model_max_length
        ids = np.ones((len(texts), max_length), dtype=np.int32)  # pad = 1
        for i, t in enumerate(texts):
            toks = [0] + [hash(w) % (self.vocab_size - 2) + 2 for w in t.split()]
            toks = toks[: max_length - 1] + [1]
            ids[i, : len(toks)] = toks
        return {"input_ids": ids}


def build_tiny_pipeline(seed: int = 0, dtype=jnp.float32) -> I2VGenXLPipeline:
    unet_cfg = UNetConfig.tiny()
    vae_cfg = VAEConfig.tiny()
    text_cfg = CLIPTextConfig.tiny()
    vision_cfg = CLIPVisionConfig.tiny()
    # tie encoder output dims to the UNet's cross-attention dim
    assert text_cfg.hidden_size == unet_cfg.cross_attention_dim
    assert vision_cfg.projection_dim == unet_cfg.cross_attention_dim

    unet = I2VGenXLUNet(unet_cfg, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=dtype)
    text = CLIPTextModel(text_cfg, dtype=dtype)
    vision = CLIPVisionModelWithProjection(vision_cfg, dtype=dtype)

    k = jax.random.key(seed)
    k_unet, k_vae, k_text, k_vision = jax.random.split(k, 4)
    f, hw = TINY_FRAMES, TINY_HW
    lat = hw // vae_cfg.downscale_factor
    params = {
        "unet": unet.init(
            k_unet,
            sample=jnp.zeros((1, f, lat, lat, 4)),
            timestep=jnp.zeros((1,), jnp.int32),
            fps=jnp.zeros((1,), jnp.int32),
            image_latents_first=jnp.zeros((1, f, lat, lat, 4)),
            image_latents=jnp.zeros((1, f, lat, lat, 4)),
            image_embeddings=jnp.zeros((1, f, unet_cfg.cross_attention_dim)),
            encoder_hidden_states=jnp.zeros((1, 7, unet_cfg.cross_attention_dim)),
        ),
        "vae": vae.init(k_vae, jnp.zeros((1, hw, hw, 3))),
        "text_encoder": text.init(k_text, jnp.zeros((1, 7), jnp.int32)),
        "image_encoder": vision.init(
            k_vision, jnp.zeros((1, vision_cfg.image_size, vision_cfg.image_size, 3))
        ),
    }
    return I2VGenXLPipeline(
        unet=unet, vae=vae, text_encoder=text, image_encoder=vision,
        params=params,
        scheduler_config=SchedulerConfig(),
        tokenizer=DummyTokenizer(text_cfg.vocab_size, text_cfg.max_position_embeddings),
        dtype=dtype,
    )


def tiny_frames(n: int = TINY_FRAMES, size: int = TINY_HW, seed: int = 0):
    """Deterministic synthetic PIL frames."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
    frames = []
    for i in range(n):
        arr = np.roll(base, shift=i, axis=1)  # simple horizontal motion
        frames.append(Image.fromarray(arr))
    return frames
