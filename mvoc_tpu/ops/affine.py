"""Affine object placement: OpenCV-affine -> normalized grid warp (JAX).

Parity for the reference's (dormant but shipped) repositioning utilities
(reference: utils.py:157-180 `cvt_cv_aff2torch_aff` + `warp_affine_torch`,
plumbed through `obj_width_height` at composite.py:185): convert a 2x3
OpenCV affine matrix into the normalized-coordinate convention and warp a
channels-last tensor with nearest sampling — used to reposition/resize
object masks and latents on the collage canvas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def cv_affine_to_normalized(theta_cv: np.ndarray, src_hw: tuple[int, int],
                            dst_hw: tuple[int, int]) -> np.ndarray:
    """2x3 OpenCV (pixel-coord, src->dst) affine -> 2x3 normalized-coords
    inverse map (dst normalized -> src normalized), align_corners=False
    torch convention."""
    sh, sw = src_hw
    dh, dw = dst_hw
    m = np.concatenate([np.asarray(theta_cv, np.float64), [[0.0, 0.0, 1.0]]])
    m_inv = np.linalg.inv(m)

    def norm(hw):
        h, w = hw
        # pixel -> [-1, 1] (align_corners=False: centers at (i+0.5)/n*2-1)
        return np.array([[2.0 / w, 0.0, 1.0 / w - 1.0],
                         [0.0, 2.0 / h, 1.0 / h - 1.0],
                         [0.0, 0.0, 1.0]])

    a = norm(src_hw)
    b_inv = np.linalg.inv(norm(dst_hw))
    return (a @ m_inv @ b_inv)[:2].astype(np.float32)


def warp_affine(x: jax.Array, theta: jax.Array, out_hw: tuple[int, int],
                mode: str = "nearest") -> jax.Array:
    """Warp [B, H, W, C] by a normalized 2x3 theta (dst->src map) to
    [B, out_h, out_w, C].  Out-of-bounds samples are zero."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    ys = (jnp.arange(oh) + 0.5) / oh * 2.0 - 1.0
    xs = (jnp.arange(ow) + 0.5) / ow * 2.0 - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    coords = jnp.stack([gx, gy, ones], axis=-1)  # [oh, ow, 3]
    src = coords @ theta.T  # [oh, ow, 2] normalized (x, y) in source
    sx = (src[..., 0] + 1.0) * 0.5 * w - 0.5
    sy = (src[..., 1] + 1.0) * 0.5 * h - 0.5
    if mode == "nearest":
        ix = jnp.round(sx).astype(jnp.int32)
        iy = jnp.round(sy).astype(jnp.int32)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ix = jnp.clip(ix, 0, w - 1)
        iy = jnp.clip(iy, 0, h - 1)
        out = x[:, iy, ix, :]  # [B, oh, ow, C]
        return jnp.where(valid[None, :, :, None], out, 0.0).astype(x.dtype)
    if mode == "bilinear":
        x0 = jnp.floor(sx).astype(jnp.int32)
        y0 = jnp.floor(sy).astype(jnp.int32)
        fx = sx - x0
        fy = sy - y0

        def gather(yy, xx):
            valid = (xx >= 0) & (xx < w) & (yy >= 0) & (yy < h)
            g = x[:, jnp.clip(yy, 0, h - 1), jnp.clip(xx, 0, w - 1), :]
            return jnp.where(valid[None, :, :, None], g, 0.0)

        out = (
            gather(y0, x0) * ((1 - fx) * (1 - fy))[None, :, :, None]
            + gather(y0, x0 + 1) * (fx * (1 - fy))[None, :, :, None]
            + gather(y0 + 1, x0) * ((1 - fx) * fy)[None, :, :, None]
            + gather(y0 + 1, x0 + 1) * (fx * fy)[None, :, :, None]
        )
        return out.astype(x.dtype)
    raise ValueError(f"unknown mode {mode}")


def place_object(x: jax.Array, scale: float, tx: float, ty: float,
                 out_hw: tuple[int, int] | None = None) -> jax.Array:
    """Convenience: scale an object about its top-left and translate by
    (tx, ty) pixels on the canvas — the `obj_width_height` use case."""
    b, h, w, c = x.shape
    theta_cv = np.array([[scale, 0.0, tx], [0.0, scale, ty]], np.float32)
    out_hw = out_hw or (h, w)
    theta = cv_affine_to_normalized(theta_cv, (h, w), out_hw)
    return warp_affine(x, jnp.asarray(theta), out_hw)
