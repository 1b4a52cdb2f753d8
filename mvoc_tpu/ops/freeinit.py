"""FreeInit-style frequency-domain noise filtering (functional).

The reference carries a dormant `frameinit_kwargs` config block
(reference: configs/group_composite/template.yaml:63-70 — gaussian
spatio-temporal low-pass with d_s/d_t cutoffs and a noise_level), the
FreeInit technique (arXiv 2312.07537): blend the low-frequency band of a
diffused latent with fresh high-frequency noise to re-initialize sampling.

Implemented as pure functions over [F, H, W, C] latents using jnp.fft —
usable both as the reference-compatible `frameinit` hook and as a general
noise-reinitialization utility.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp


def _freq_grid(f: int, h: int, w: int):
    """Normalized centered frequency coordinates in [-1, 1] per axis."""
    ft = (jnp.arange(f) - (f - 1) / 2) / max(f / 2, 1e-8)
    fy = (jnp.arange(h) - (h - 1) / 2) / max(h / 2, 1e-8)
    fx = (jnp.arange(w) - (w - 1) / 2) / max(w / 2, 1e-8)
    return jnp.meshgrid(ft, fy, fx, indexing="ij")


def lowpass_mask(
    f: int, h: int, w: int,
    d_s: float = 0.25, d_t: float = 0.25,
    method: Literal["gaussian", "ideal", "butterworth"] = "gaussian",
    order: int = 4,
) -> jax.Array:
    """Spatio-temporal low-pass filter mask, fftshift-centered, [F, H, W]."""
    t, y, x = _freq_grid(f, h, w)
    if d_s <= 0 or d_t <= 0:
        return jnp.zeros((f, h, w))
    r2 = (x / d_s) ** 2 + (y / d_s) ** 2 + (t / d_t) ** 2
    if method == "gaussian":
        return jnp.exp(-0.5 * r2)
    if method == "ideal":
        return (r2 <= 1.0).astype(jnp.float32)
    if method == "butterworth":
        return 1.0 / (1.0 + r2**order)
    raise ValueError(f"unknown filter method {method}")


def freq_mix(latents: jax.Array, noise: jax.Array, lp_mask: jax.Array) -> jax.Array:
    """low-frequency(latents) + high-frequency(noise) — FreeInit's 2D+t
    frequency mixing.  latents/noise: [F, H, W, C]; lp_mask: [F, H, W]."""
    m = lp_mask[..., None]
    lf = jnp.fft.fftshift(jnp.fft.fftn(latents.astype(jnp.complex64), axes=(0, 1, 2)),
                          axes=(0, 1, 2))
    hf = jnp.fft.fftshift(jnp.fft.fftn(noise.astype(jnp.complex64), axes=(0, 1, 2)),
                          axes=(0, 1, 2))
    mixed = lf * m + hf * (1.0 - m)
    out = jnp.fft.ifftn(jnp.fft.ifftshift(mixed, axes=(0, 1, 2)), axes=(0, 1, 2))
    return jnp.real(out).astype(latents.dtype)


def frameinit(
    latents: jax.Array,
    key: jax.Array,
    alphas_cumprod: jax.Array,
    noise_level: int = 850,
    d_s: float = 0.25,
    d_t: float = 0.25,
    method: str = "gaussian",
) -> jax.Array:
    """Reference-config-compatible entry: diffuse `latents` to `noise_level`,
    then keep only their low-frequency band and refill high frequencies with
    fresh noise."""
    f, h, w, c = latents.shape
    noise = jax.random.normal(key, latents.shape, dtype=jnp.float32)
    a = alphas_cumprod[noise_level]
    diffused = jnp.sqrt(a) * latents.astype(jnp.float32) + jnp.sqrt(1 - a) * noise
    mask = lowpass_mask(f, h, w, d_s=d_s, d_t=d_t, method=method)
    return freq_mix(diffused, noise, mask).astype(latents.dtype)
