"""AutoencoderKL (the SD-2.x VAE shipped in the I2VGen-XL checkpoint) in
flax.linen, channels-last.

The reference uses it per-frame for video encode (encode_vae_video,
reference: pipeline_i2vgen_xl.py:893-920), first-frame conditioning latents
(prepare_image_latents, :860-890) and chunked decode (decode_latents,
:771-791), always through `latent_dist.sample() * scaling_factor`.

Here encode returns the Gaussian moments; sampling is an explicit pure
function of a jax.random key (no hidden generator state).  Frames are just
batch — encode/decode the whole [B*F, H, W, 3] tensor in one XLA call
instead of a python per-frame loop (the reference loops frames and decodes
with chunk size 1 to fit GPU memory; on TPU we batch and let XLA tile).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mvoc_tpu.models.layers import GroupNorm, sdpa


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215

    @property
    def downscale_factor(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @staticmethod
    def from_diffusers_config(cfg: dict[str, Any]) -> "VAEConfig":
        return VAEConfig(
            in_channels=cfg.get("in_channels", 3),
            out_channels=cfg.get("out_channels", 3),
            block_out_channels=tuple(cfg.get("block_out_channels", (128, 256, 512, 512))),
            layers_per_block=cfg.get("layers_per_block", 2),
            latent_channels=cfg.get("latent_channels", 4),
            norm_num_groups=cfg.get("norm_num_groups", 32),
            scaling_factor=cfg.get("scaling_factor", 0.18215),
        )

    @staticmethod
    def from_pretrained(checkpoint_dir: str) -> "VAEConfig":
        with open(os.path.join(checkpoint_dir, "vae", "config.json")) as f:
            return VAEConfig.from_diffusers_config(json.load(f))

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)


class VAEResnetBlock(nn.Module):
    """ResnetBlock2D without time embedding, GN eps 1e-6 (VAE flavor)."""

    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_c = x.shape[-1]
        h = GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_c != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial tokens with GroupNorm and
    biased q/k/v projections + residual (diffusers VAE mid-block attention)."""

    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        residual = x
        t = GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        t = t.reshape(b, h * w, c)
        q = nn.Dense(c, use_bias=True, dtype=self.dtype, name="to_q")(t)
        k = nn.Dense(c, use_bias=True, dtype=self.dtype, name="to_k")(t)
        v = nn.Dense(c, use_bias=True, dtype=self.dtype, name="to_v")(t)
        t = sdpa(q, k, v, heads=1)
        t = nn.Dense(c, use_bias=True, dtype=self.dtype, name="to_out_0")(t)
        return t.reshape(b, h, w, c) + residual


class MidBlock(nn.Module):
    channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = VAEResnetBlock(self.channels, self.groups, dtype=self.dtype, name="resnets_0")(x)
        x = VAEAttention(self.channels, self.groups, dtype=self.dtype, name="attentions_0")(x)
        x = VAEResnetBlock(self.channels, self.groups, dtype=self.dtype, name="resnets_1")(x)
        return x


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.config
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = VAEResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                                   name=f"down_blocks_{i}_resnets_{j}")(x)
            if i < len(cfg.block_out_channels) - 1:
                # VAE downsampler: right/bottom asymmetric pad + stride-2 valid conv
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID", dtype=self.dtype,
                            name=f"down_blocks_{i}_downsamplers_0_conv")(x)
        x = MidBlock(cfg.block_out_channels[-1], cfg.norm_num_groups, dtype=self.dtype,
                     name="mid_block")(x)
        x = GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        cfg = self.config
        rev = tuple(reversed(cfg.block_out_channels))
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = MidBlock(rev[0], cfg.norm_num_groups, dtype=self.dtype, name="mid_block")(x)
        for i, ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = VAEResnetBlock(ch, cfg.norm_num_groups, dtype=self.dtype,
                                   name=f"up_blocks_{i}_resnets_{j}")(x)
            if i < len(rev) - 1:
                b, h, w, c = x.shape
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest x2
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_blocks_{i}_upsamplers_0_conv")(x)
        x = GroupNorm(cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        return x


class AutoencoderKL(nn.Module):
    """encode(x) -> (mean, logvar); decode(z) -> rgb.  All channels-last."""

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype, name="post_quant_conv")

    def encode(self, x: jax.Array) -> tuple[jax.Array, jax.Array]:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jax.Array, key: Optional[jax.Array] = None):
        mean, logvar = self.encode(x)
        z = sample_latents(mean, logvar, key) if key is not None else mean
        return self.decode(z), mean, logvar


def sample_latents(mean: jax.Array, logvar: jax.Array, key: jax.Array) -> jax.Array:
    """DiagonalGaussianDistribution.sample with an explicit PRNG key."""
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, dtype=mean.dtype)


def tiled_decode(
    decode_fn,
    z: "jax.Array",
    tile_latent: int = 64,
    overlap_latent: int = 8,
):
    """Spatially tiled VAE decode with linear seam blending.

    Parity for the reference's `enable_vae_tiling` memory knob
    (pipeline_i2vgen_xl.py:520-550): decode overlapping latent tiles and
    blend the overlaps so a 720p+ video decodes within a bounded activation
    footprint.  `decode_fn(z_tile) -> rgb_tile` (already scaled latents).
    """
    import numpy as np

    b, h, w, c = z.shape
    if h <= tile_latent and w <= tile_latent:
        return decode_fn(z)
    stride = tile_latent - overlap_latent
    ys = list(range(0, max(h - overlap_latent, 1), stride))
    xs = list(range(0, max(w - overlap_latent, 1), stride))
    # clamp last tiles to the edge
    ys = sorted({min(y, max(h - tile_latent, 0)) for y in ys})
    xs = sorted({min(x, max(w - tile_latent, 0)) for x in xs})

    probe = decode_fn(z[:, : min(tile_latent, h), : min(tile_latent, w)])
    scale = probe.shape[1] // min(tile_latent, h)
    H, W = h * scale, w * scale
    out = jnp.zeros((b, H, W, probe.shape[-1]), dtype=jnp.float32)
    weight = jnp.zeros((1, H, W, 1), dtype=jnp.float32)

    def ramp(n, lo_blend, hi_blend):
        wgt = np.ones(n, np.float32)
        k = overlap_latent * scale
        if lo_blend and k > 0:
            wgt[:k] = np.linspace(0.0, 1.0, k, endpoint=False) + 0.5 / k
        if hi_blend and k > 0:
            wgt[-k:] = wgt[-k:] * (np.linspace(1.0, 0.0, k, endpoint=False) + 0.5 / k)
        return wgt

    for yi, y in enumerate(ys):
        for xi, x in enumerate(xs):
            th = min(tile_latent, h - y)
            tw = min(tile_latent, w - x)
            tile = decode_fn(z[:, y : y + th, x : x + tw]).astype(jnp.float32)
            wy = ramp(th * scale, y > 0, y + th < h)
            wx = ramp(tw * scale, x > 0, x + tw < w)
            wgt = jnp.asarray(np.outer(wy, wx))[None, :, :, None]
            Y, X = y * scale, x * scale
            out = out.at[:, Y : Y + th * scale, X : X + tw * scale].add(tile * wgt)
            weight = weight.at[:, Y : Y + th * scale, X : X + tw * scale].add(wgt)
    return (out / jnp.maximum(weight, 1e-8)).astype(probe.dtype)
