"""Mask machinery: load + preprocess per-object masks to latent resolution.

Reference semantics (utils.py:92-154, exercised at
pipeline_i2vgen_xl.py:1586-1599):

* static mask = one grayscale PNG, dynamic = directory of per-frame PNGs
  (numeric-stem sorted, truncated to n_frames);
* downscale by x8 to latent resolution with PIL's default BICUBIC resample
  (this produces the SOFT float mask used by noise fusion and temporal
  attention injection);
* binary mask = cv2-style threshold at >10 of the DOWNSCALED grayscale
  (used by spatial-attention and conv-site injection).

We return [F, h, w] float32 arrays (soft in [0,1], binary in {0,1}) —
broadcasting to batch/channel happens in the compute code, and the
per-attention-resolution pyramid is precomputed once
(mvoc_tpu/pnp.py:build_mask_pyramid) instead of interpolated inside every
attention call like the reference does (pnp_utils.py:650, 807).
"""

from __future__ import annotations

import os
import os.path as osp
from glob import glob

import numpy as np
from PIL import Image

from mvoc_tpu.io.media import _frame_sort_key


def _load_one(
    path: str, downscale: int, target_wh: tuple[int, int] | None = None
) -> tuple[np.ndarray, np.ndarray]:
    m = Image.open(path).convert("L")
    w, h = m.size
    # target_wh generalizes the reference's fixed //downscale (equivalent
    # when mask resolution == image resolution); needed when masks are
    # authored at a different size than the working resolution.
    m = m.resize(target_wh or (w // downscale, h // downscale))  # PIL default = BICUBIC
    arr = np.asarray(m, dtype=np.float32)
    soft = arr / 255.0
    binary = (arr > 10).astype(np.float32)  # cv2.threshold(.., 10, 255, BINARY)
    return soft, binary


def mask_preprocess(
    mask_path: str,
    n_frames: int,
    downscale: int = 8,
    target_wh: tuple[int, int] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (soft, binary), each [F, h, w] float32."""
    if osp.isdir(mask_path):
        paths = glob(osp.join(mask_path, "*.png"))
        if not paths:
            raise FileNotFoundError(f"no mask frames in {mask_path}")
        paths.sort(key=_frame_sort_key)
        paths = paths[:n_frames]
        pairs = [_load_one(p, downscale, target_wh) for p in paths]
        soft = np.stack([p[0] for p in pairs])
        binary = np.stack([p[1] for p in pairs])
        if soft.shape[0] < n_frames:  # repeat last frame if short
            pad = n_frames - soft.shape[0]
            soft = np.concatenate([soft, np.repeat(soft[-1:], pad, 0)])
            binary = np.concatenate([binary, np.repeat(binary[-1:], pad, 0)])
        return soft, binary
    soft, binary = _load_one(mask_path, downscale, target_wh)
    return (
        np.repeat(soft[None], n_frames, axis=0),
        np.repeat(binary[None], n_frames, axis=0),
    )


def masks_from_arrays(
    masks01: np.ndarray, n_frames: int, downscale: int = 8
) -> tuple[np.ndarray, np.ndarray]:
    """Same contract but from in-memory [*, H, W] arrays in [0,1] — used by
    tests and programmatic callers."""
    out_s, out_b = [], []
    frames = masks01 if masks01.ndim == 3 else masks01[None]
    for fr in frames:
        img = Image.fromarray((fr * 255).astype(np.uint8), mode="L")
        w, h = img.size
        img = img.resize((w // downscale, h // downscale))
        arr = np.asarray(img, dtype=np.float32)
        out_s.append(arr / 255.0)
        out_b.append((arr > 10).astype(np.float32))
    soft, binary = np.stack(out_s), np.stack(out_b)
    if soft.shape[0] == 1:
        soft = np.repeat(soft, n_frames, axis=0)
        binary = np.repeat(binary, n_frames, axis=0)
    return soft[:n_frames], binary[:n_frames]


def exclusive_occlusion_masks(
    masks_binary: np.ndarray, masks_soft: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-object EXCLUSIVE masks: object j's region minus everything a
    later object covers (cumulative-union XOR), so each pixel belongs to at
    most one object with later-object priority.

    The reference computes exactly this and then discards it, reassigning
    the original masks (pipeline_i2vgen_xl.py:1606-1632) — later-object-wins
    comes from the injection loop order instead.  Provided here as a
    first-class utility (useful for analysis/visualization and alternative
    compositing policies).

    masks_*: [N, F, h, w]; returns (soft_exclusive, binary_exclusive).
    """
    n = masks_binary.shape[0]
    b = masks_binary.astype(bool)
    cum_union = [b[i:].any(axis=0) for i in range(n)]  # union of j >= i
    out_b, out_s = [], []
    for i in range(n):
        later = cum_union[i + 1] if i + 1 < n else np.zeros_like(b[i])
        exclusive = np.logical_xor(cum_union[i], later)
        out_b.append(np.logical_and(b[i], exclusive).astype(np.float32))
        out_s.append(masks_soft[i] * exclusive.astype(np.float32))
    return np.stack(out_s), np.stack(out_b)
