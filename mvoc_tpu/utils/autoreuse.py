"""Automatic reuse-interval selection gated on reconstruction fidelity.

The encoder-reuse / deep-reuse inversion modes (training-free feature
reuse, arXiv 2312.09608) approximate the inverted trajectory that every
downstream composite consumes — and the right interval k is
content-dependent: slow smooth footage tolerates k=5, fast or textured
footage may not.  The reference's only gate is eyeballing
``ddim_reconstruction.mp4`` (reference: inverse.py:192-227).  This module
replaces our round-4 CLI warning with a mechanism: a cheap truncated-step
reconstruction probe on the ACTUAL video picks the largest k whose
round-trip PSNR clears a configurable threshold.

Probe construction: invert the video with a SHORT schedule (default 50
steps instead of the production 500) at candidate k, reconstruct from the
resulting x_T with the same short schedule at cfg=1, and score PSNR
against the source frames.  At 50 steps adjacent timesteps are ~20 apart
(vs ~2 at 500), so features drift MORE between consecutive steps and
reuse-k hurts MORE than it will in the production run — the probe is a
conservative upper bound on production drift, which is the right
direction for a gate.  Cost: ~2x50 UNet forwards per probed k, ~1/10 of
one production inversion; candidates are probed largest-first and probing
stops at the first k that clears the bar.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional, Sequence

import numpy as np

logger = logging.getLogger("mvoc_tpu.autoreuse")

DEFAULT_CANDIDATES = (5, 3, 2)
DEFAULT_THRESHOLD_DB = 30.0
DEFAULT_PROBE_STEPS = 50


def select_reuse_k(
    probe_fn: Callable[[int], float],
    candidates: Sequence[int] = DEFAULT_CANDIDATES,
    threshold_db: float = DEFAULT_THRESHOLD_DB,
) -> tuple[int, list[dict]]:
    """Largest candidate k whose probe PSNR clears threshold_db, else 1.

    Probes descending and stops at the first pass (larger k = cheaper
    production run), so degraded content — whose probe PSNR is lower at
    every k — lands on a smaller k or on exact inversion (k=1).
    Returns (k, report) where report lists every probed candidate.
    """
    report: list[dict] = []
    for k in sorted({int(k) for k in candidates if int(k) > 1}, reverse=True):
        score = float(probe_fn(k))
        passed = score >= threshold_db
        report.append({"k": k, "psnr_db": round(score, 3), "passed": passed})
        logger.info("reuse probe k=%d: recon PSNR %.2f dB (threshold %.1f) %s",
                    k, score, threshold_db, "PASS" if passed else "fail")
        if passed:
            return k, report
    return 1, report


def make_invert_probe(
    pipe,
    frames,
    first_frame=None,
    *,
    height: int,
    width: int,
    num_frames: int,
    target_fps: int = 8,
    prompt: str = "",
    seed: int = 8888,
    probe_steps: int = DEFAULT_PROBE_STEPS,
    deep_reuse: bool = False,
    encoder_reuse_depth: Optional[int] = None,
) -> Callable[[int], float]:
    """probe(k) -> reconstruction PSNR (dB) for reuse interval k.

    Runs the truncated-step invert -> reconstruct round-trip described in
    the module docstring on the given frames.  The source latents are
    VAE-encoded once and shared across probed candidates.
    """
    import jax.numpy as jnp

    from mvoc_tpu.io import media
    from mvoc_tpu.utils.metrics import psnr

    src = media.pil_to_01(frames)
    first = first_frame or frames[0]
    x0 = pipe.encode_vae_video(frames, height, width)

    def probe(k: int) -> float:
        _, trajectory = pipe.invert(
            frames, first_frame=first, prompt=prompt,
            height=height, width=width, target_fps=target_fps,
            num_frames=num_frames, num_inference_steps=probe_steps,
            seed=seed, latents=x0,
            encoder_reuse_interval=int(k), deep_reuse=deep_reuse,
            encoder_reuse_depth=encoder_reuse_depth,
        )
        video = pipe.sample(
            first, prompt=prompt, height=height, width=width,
            target_fps=target_fps, num_frames=num_frames,
            num_inference_steps=probe_steps, guidance_scale=1.0,
            ddim_init_latents_t_idx=0,
            latents=jnp.asarray(trajectory[-1]), seed=seed,
        )
        return float(psnr(video, src))

    return probe


def resolve_auto_reuse(pipe, config) -> None:
    """Resolve ``encoder_reuse_interval: auto`` on one inversion config
    entry IN PLACE, using the entry's own video as probe content.

    Knobs (all under inverse_config, with defaults):
      reuse_auto_candidates:    [5, 3, 2]
      reuse_auto_threshold_db:  30.0
      reuse_auto_probe_steps:   50
    """
    inv = config.inverse_config
    if inv.get("encoder_reuse_interval", 1) != "auto":
        return
    from mvoc_tpu.cli.inverse import _load_entry_frames

    frames, first = _load_entry_frames(config)
    image_size = tuple(config.image_size)
    probe = make_invert_probe(
        pipe, frames, first,
        height=image_size[1], width=image_size[0],
        num_frames=config.n_frames, target_fps=inv.target_fps,
        prompt=inv.prompt, seed=config.get("seed", 8888),
        probe_steps=int(inv.get("reuse_auto_probe_steps", DEFAULT_PROBE_STEPS)),
        deep_reuse=inv.get("deep_reuse", False),
        encoder_reuse_depth=inv.get("encoder_reuse_depth", None),
    )
    k, report = select_reuse_k(
        probe,
        candidates=list(inv.get("reuse_auto_candidates", DEFAULT_CANDIDATES)),
        threshold_db=float(inv.get("reuse_auto_threshold_db",
                                   DEFAULT_THRESHOLD_DB)),
    )
    inv.encoder_reuse_interval = k
    if k == 1:
        # every candidate failed the fidelity bar on this content: the
        # production run must not silently keep the deep approximation
        inv.deep_reuse = False
    inv.reuse_auto_report = report
    # Config sub-node access copies the underlying dict (config.py:38), so
    # mutations must be written back through the parent to take effect
    config.inverse_config = inv
    logger.info("auto reuse gate for %s selected k=%d (%s)",
                config.get("video_name", "?"), k, report)
    return
