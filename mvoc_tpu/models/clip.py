"""CLIP text + vision encoders (flax.linen), self-contained.

The reference conditions I2VGen-XL on (a) CLIP text embeddings of the prompt
(`encode_prompt`, reference: pipeline_i2vgen_xl.py:552-737, clip_skip
support) and (b) a CLIP vision embedding of the (first) frame
(`_encode_image`, :739-769, projected `image_embeds`, zero tensor as the CFG
negative).  The checkpoint ships OpenCLIP-ViT-H-style encoders
(hidden 1024 text / 1280 vision, cross_attention_dim 1024).

We implement both towers from scratch rather than depending on
transformers' (deprecated) Flax models; configs are read from the HF
checkpoint's config.json at load time.  Tokenization stays host-side via
transformers.CLIPTokenizer (pure python, no torch).
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from mvoc_tpu.models.layers import LayerNorm


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 23
    num_attention_heads: int = 16
    max_position_embeddings: int = 77
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5

    @staticmethod
    def from_json(path: str) -> "CLIPTextConfig":
        with open(path) as f:
            raw = json.load(f)
        fields = {f.name for f in dataclasses.fields(CLIPTextConfig)}
        return CLIPTextConfig(**{k: v for k, v in raw.items() if k in fields})

    @staticmethod
    def tiny() -> "CLIPTextConfig":
        return CLIPTextConfig(vocab_size=64, hidden_size=16, intermediate_size=32,
                              num_hidden_layers=2, num_attention_heads=2,
                              max_position_embeddings=12)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_hidden_layers: int = 32
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 14
    projection_dim: int = 1024
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-5

    @staticmethod
    def from_json(path: str) -> "CLIPVisionConfig":
        with open(path) as f:
            raw = json.load(f)
        fields = {f.name for f in dataclasses.fields(CLIPVisionConfig)}
        return CLIPVisionConfig(**{k: v for k, v in raw.items() if k in fields})

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(hidden_size=16, intermediate_size=32,
                                num_hidden_layers=2, num_attention_heads=2,
                                image_size=28, patch_size=14, projection_dim=16)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name in ("gelu", "gelu_new"):
        return lambda x: jax.nn.gelu(x, approximate=(name == "gelu_new"))
    raise ValueError(f"unknown activation {name}")


class CLIPAttention(nn.Module):
    hidden_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal: bool = False) -> jax.Array:
        b, s, c = x.shape
        h = self.num_heads
        d = c // h
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / (d ** 0.5)
        if causal:
            mask = jnp.tril(jnp.ones((s, s), dtype=bool))
            logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    hidden_size: int
    intermediate_size: int
    num_heads: int
    hidden_act: str
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, causal: bool = False) -> jax.Array:
        h = LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(self.hidden_size, self.num_heads, dtype=self.dtype,
                              name="self_attn")(h, causal=causal)
        h = LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(self.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = _act(self.hidden_act)(h)
        h = nn.Dense(self.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Returns all hidden states so callers can apply clip_skip (the
    reference exposes clip_skip in encode_prompt, pipeline_i2vgen_xl.py:552)."""

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array, clip_skip: int = 0) -> jax.Array:
        cfg = self.config
        b, s = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (cfg.max_position_embeddings, cfg.hidden_size), jnp.float32)
        x = tok + pos[None, :s].astype(self.dtype)
        hidden_states = []
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(
                cfg.hidden_size, cfg.intermediate_size, cfg.num_attention_heads,
                cfg.hidden_act, cfg.layer_norm_eps, dtype=self.dtype,
                name=f"layers_{i}",
            )(x, causal=True)
            hidden_states.append(x)
        if clip_skip > 0:
            # HF semantics: take hidden state clip_skip layers before the
            # end, then still apply the final layer norm.
            x = hidden_states[-(clip_skip + 1)]
        x = LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                      name="final_layer_norm")(x)
        return x


class CLIPVisionModelWithProjection(nn.Module):
    """Returns the projected image embedding ([B, projection_dim]) the
    UNet's context_embedding MLP consumes (pipeline_i2vgen_xl.py:757)."""

    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        cfg = self.config
        b = pixel_values.shape[0]
        # pixel_values channels-last [B, H, W, 3]
        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
            dtype=self.dtype, name="patch_embedding",
        )(pixel_values)
        patches = patches.reshape(b, -1, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,), jnp.float32)
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, patches], axis=1)
        n_pos = x.shape[1]
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n_pos, cfg.hidden_size), jnp.float32)
        x = x + pos[None].astype(self.dtype)
        x = LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="pre_layrnorm")(x)
        for i in range(cfg.num_hidden_layers):
            x = CLIPEncoderLayer(
                cfg.hidden_size, cfg.intermediate_size, cfg.num_attention_heads,
                cfg.hidden_act, cfg.layer_norm_eps, dtype=self.dtype,
                name=f"layers_{i}",
            )(x, causal=False)
        pooled = LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                           name="post_layernorm")(x[:, 0])
        return nn.Dense(cfg.projection_dim, use_bias=False, dtype=self.dtype,
                        name="visual_projection")(pooled)


# CLIP preprocessing stats (feature_extractor config; reference normalizes
# with these via CLIPImageProcessor — pipeline_i2vgen_xl.py:747-754)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize_clip_image(pixels01: jax.Array) -> jax.Array:
    """[B, H, W, 3] in [0,1] -> CLIP-normalized."""
    mean = jnp.asarray(CLIP_IMAGE_MEAN, dtype=pixels01.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, dtype=pixels01.dtype)
    return (pixels01 - mean) / std
