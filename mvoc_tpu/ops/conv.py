"""Matmul-form convolutions for the UNet's hot conv shapes.

The round-4 profiler trace (TPU_RUNS_r04.log, traces/r4_default) shows the
flagship composite step spends 60% of device time in convolution fusions,
and XLA's TPU conv emitter leaves a lot of MXU idle on exactly the shapes
the I2VGen-XL UNet runs:

  * 320-ch 3x3 spatial convs at 64x64 latent:   61-77 TF/s  (peak 197)
  * 640-ch at 32x32:                            97-117 TF/s
  * 1280-ch at 16x16:                          119-134 TF/s
  * (3,1,1) temporal convs at 8x8:              35 TF/s

A same-shape dot_general (the FF/attention projections) measures 150-180
TF/s, so the gap is the conv lowering, not the shapes.  These helpers
re-express stride-1 'SAME' 3x3 convs and the (3,1,1) temporal conv as one
(or three) large dot_generals over stacked kernel taps plus a shift-add
epilogue that XLA fuses into a single loop fusion.  All are EXACT (same
f32 MXU accumulation; only the tap-summation order differs from the conv
emitter — parity pinned to lax.conv within bf16 rounding in
tests/test_conv_forms.py).

Reference counterpart: torch/cuDNN picks conv algorithms per shape
(implicit GEMM etc.) behind torch.nn.Conv2d/3d
(/root/reference/i2vgen-xl/pipelines/pipeline_i2vgen_xl.py uses stock
diffusers blocks); on TPU the analogous algorithm choice is ours to make.

Forms (probed on-chip by scripts/conv_probe.py; dispatched from
ops.quantize.QuantConv — spatial 3x3 by exact geometry via the
SPATIAL_WINNERS (c_in, h, w) table, temporal (3,1,1) by GEMM row count
M = B*F*H*W via TCONV_STACK3_MAX_ROWS):

  conv3x3_stack9   one dot, K=C_in, N=9*C_out, 9-window output epilogue
  conv3x3_wcat3    width-concat K=3*C_in, 3 dots, H-shift output epilogue
  conv3x3_im2col9  full im2col K=9*C_in, one dot, no epilogue
  tconv3_stack3    temporal: one dot, N=3*C_out, frame-shift epilogue
"""

from __future__ import annotations

import contextlib
import os
from typing import Optional

import jax
import jax.numpy as jnp


def _dot_last(x: jax.Array, w: jax.Array, out_dtype) -> jax.Array:
    """dot_general contracting x's last dim with w's first; f32 accumulate."""
    return jax.lax.dot_general(
        x, w, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_dtype)


def conv3x3_stack9(x: jax.Array, w: jax.Array, *,
                   out_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """3x3 stride-1 SAME conv as ONE dot with all 9 taps stacked along N.

    x: [N, H, W, C_in] channels-last; w: [3, 3, C_in, C_out] (HWIO,
    cross-correlation like lax.conv).  The dot runs on the padded input
    ([N, H+2, W+2, C]) so the epilogue is 9 pure in-bounds window reads of
    the dot output — one XLA loop fusion, no gather/pad logic.

    Cost model at [16,64,64,320]: dot = 2*M*K*9O = the conv's exact flops
    + a 2-row/col halo; y_all is bf16 [N,H+2,W+2,9O] (9x the activation) —
    epilogue traffic ~10x the output tensor.  Wins when the MXU gain beats
    that bandwidth; the probe decides.
    """
    out_dtype = out_dtype or x.dtype
    n, h, ww, c = x.shape
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3) and ci == c
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # [3,3,C,O] -> [C, 3*3*O]; loop-invariant, hoisted by XLA out of scans
    wstack = jnp.transpose(w, (2, 0, 1, 3)).reshape(c, 9 * co)
    y_all = _dot_last(xp, wstack, x.dtype)  # [N,H+2,W+2,9*O]
    y_all = y_all.reshape(n, h + 2, ww + 2, 9, co)
    # out[b,h,w] = sum_{i,j} y_all[b, h+i, w+j, tap(i,j)] with tap weights
    # indexed so that tap (i,j) carries w[2-i, 2-j]... no: cross-correlation
    # out[h,w] = sum_{i,j} xp[h+i, w+j] . w[i,j]; y_all[b,p,q,tap(i,j)] =
    # xp[b,p,q] . w[i,j], so out[h,w] = sum y_all[b, h+i, w+j, tap(i,j)].
    out = jnp.zeros((n, h, ww, co), jnp.float32)
    for i in range(3):
        for j in range(3):
            out = out + y_all[:, i:i + h, j:j + ww, i * 3 + j].astype(jnp.float32)
    return out.astype(out_dtype)


def conv3x3_wcat3(x: jax.Array, w: jax.Array, *,
                  out_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """3x3 stride-1 SAME conv as width-concat (K=3*C_in) + 3 dots + H-shift.

    The three width taps fold into the contraction (xw[b,h,w] =
    concat(xp[b,h,w], xp[b,h,w+1], xp[b,h,w+2])); the three height taps
    stay separate dots over the full H+2 padded extent, combined by an
    in-bounds window epilogue exactly like conv3x3_stack9 (3 windows, not
    9).  y buffers are 3x the output — the lightest epilogue of the three
    forms; K=3*C_in aligns 320-ch tiers to 960 (7.5 -> 8 MXU tiles, 94%).
    """
    out_dtype = out_dtype or x.dtype
    n, h, ww, c = x.shape
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3) and ci == c
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # [N,H+2,W+2,C]
    xw = jnp.concatenate(
        [xp[:, :, 0:ww], xp[:, :, 1:ww + 1], xp[:, :, 2:ww + 2]], axis=-1,
    )  # [N, H+2, W, 3C]
    # w[i] as [3C, O]: rows ordered (j, c) to match xw's concat order
    wrows = jnp.transpose(w, (1, 2, 0, 3)).reshape(3 * c, 3, co)  # [(j,c),i,O]
    out = jnp.zeros((n, h, ww, co), jnp.float32)
    for i in range(3):
        yi = _dot_last(xw, wrows[:, i], x.dtype)  # [N,H+2,W,O]
        out = out + yi[:, i:i + h].astype(jnp.float32)
    return out.astype(out_dtype)


def conv3x3_im2col9(x: jax.Array, w: jax.Array, *,
                    out_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """3x3 stride-1 SAME conv as explicit im2col (K=9*C_in) + ONE dot.

    Materializes the full 9x patch tensor (one concat fusion, 9x the
    activation bytes) but the dot is maximally efficient (K=2880 for the
    320 tier, no epilogue at all).
    """
    out_dtype = out_dtype or x.dtype
    n, h, ww, c = x.shape
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3) and ci == c
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [xp[:, i:i + h, j:j + ww] for i in range(3) for j in range(3)],
        axis=-1,
    )  # [N,H,W,9C] ordered (i,j,c)
    wcols = w.reshape(9 * ci, co)  # HWIO rows are (i,j,c) -- matches
    return _dot_last(cols, wcols, out_dtype)


def tconv3_stack3(x5: jax.Array, w: jax.Array, *,
                  out_dtype: Optional[jnp.dtype] = None) -> jax.Array:
    """(3,1,1) temporal conv over [B, F, H, W, C] as ONE dot + frame shifts.

    The trace's worst conv (35 TF/s at [1,16,8,8,1280]): XLA sees 3 spatial
    dims and tiny H, W; as a dot it is [B*F*HW, C] x [C, 3*C_out] — fully
    MXU-aligned for every channel tier.  out[f] = y[f-1,tap0] + y[f,tap1] +
    y[f+1,tap2] with zero-padded frame ends (SAME padding (1,1) on F).
    """
    out_dtype = out_dtype or x5.dtype
    b, f, h, ww, c = x5.shape
    kf, kh, kw, ci, co = w.shape
    assert (kf, kh, kw) == (3, 1, 1) and ci == c
    wstack = jnp.transpose(w[:, 0, 0], (1, 0, 2)).reshape(c, 3 * co)
    y = _dot_last(x5, wstack, x5.dtype).reshape(b, f, h, ww, 3, co)
    yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0), (0, 0)))
    # out[f] = sum_t x5[f + t - 1] . w[t] = sum_t y[f + t - 1, t]
    out = (yp[:, 0:f, :, :, 0].astype(jnp.float32)
           + y[:, :, :, :, 1].astype(jnp.float32)
           + yp[:, 2:f + 2, :, :, 2].astype(jnp.float32))
    return out.astype(out_dtype)


# ---------------------------------------------------------------------------
# Dispatch

_FORMS = {"stack9": conv3x3_stack9, "wcat3": conv3x3_wcat3,
          "im2col9": conv3x3_im2col9}

# Probed winners (scripts/conv_probe.py sets 1-4, on-chip, scan-amortized
# difference timing — ROUND_NOTES r4).  Spatial 3x3: XLA's emitter won every
# probed workload geometry (140-221 TF/s isolated; the r4 trace's low
# per-fusion rates were epilogue dilution).  The one exception,
# [16,16,16,1280] (wcat3 1.13x), is geometry-exact — the same tier loses at
# 8x8 (0.72x), at 720p 23x40 (0.95x), and at the B=2 edit batch (0.79x) —
# and is worth ~0.15% of a step, so it is NOT dispatched; the table stays
# empty (keyed (c_in, h, w)) for future probed entries.  Temporal (3,1,1):
# stack3's win tracks the GEMM row count M = B*F*H*W, not the channel tier
# (M=1024: 25.4x; 2048: 2.81x; 4096: 1.86x; >=8192: losing as often as
# winning, worst 0.43x) — XLA's 3D conv emitter tiles tiny-M convs onto the
# MXU catastrophically badly, and the dot form caps out near roofline
# (392 TF/s at M=1024).  The M<=4096 rule measured +1.8% on the default
# composite step (0.8526 -> 0.8683, TPU_RUNS_r04.log conv_auto_default).
# MVOC_CONV_IMPL overrides every spatial 3x3 at once (xla | auto | stack9 |
# wcat3 | im2col9); MVOC_TCONV_IMPL the temporal conv (xla | auto | stack3).
SPATIAL_WINNERS: dict = {}
TCONV_STACK3_MAX_ROWS = 4096


def spatial_form(c_in: int, h: int, w: int):
    """The 3x3 form to use for this probed geometry (None = lax.conv)."""
    impl = os.environ.get("MVOC_CONV_IMPL", "auto")
    if impl == "auto":
        impl = SPATIAL_WINNERS.get((c_in, h, w))
    if impl in (None, "xla"):
        return None
    return _FORMS.get(impl)


def _tconv_max_rows() -> int:
    """The dispatch threshold; MVOC_TCONV_ROWS overrides for on-chip A/Bs."""
    return int(os.environ.get("MVOC_TCONV_ROWS", TCONV_STACK3_MAX_ROWS))


# Stage-keyed dispatch override (round-5 e2e A/B, TPU_RUNS_r05.log +
# r04.log stage breakdowns): the stack3 dispatch is faster for the
# COMPOSITE stage (22.24/22.28 s vs 22.69 s xla) but slower for the
# deep-reuse INVERSION stage (167.3/167.7 s vs 164.9 s xla) — the same
# GEMM row count meets different surrounding fusion contexts in the two
# programs.  Pipelines wrap inversion traces in tconv_override("xla");
# None defers to the MVOC_TCONV_IMPL env / threshold rule.
_TCONV_OVERRIDE: Optional[str] = None


@contextlib.contextmanager
def tconv_override(impl: Optional[str]):
    """Force the temporal-conv impl ('xla' | 'stack3' | None) for traces
    performed inside the context (trace-time decision; compiled programs
    keep whatever was active when they traced)."""
    global _TCONV_OVERRIDE
    prev = _TCONV_OVERRIDE
    _TCONV_OVERRIDE = impl
    try:
        yield
    finally:
        _TCONV_OVERRIDE = prev


TCONV_STACK3_MAX_FRAMES = 16


def temporal_form(n_rows: int, n_frames: int = 16):
    """stack3 for small-row temporal convs (probed rule), else lax.conv.

    Guarded to the probed envelope: every stack3 win was measured at
    F<=16 ([1,16,8,8,1280] 25.4x ... [1,16,16,16,1280] 1.86x — on-chip
    probes, ROUND_NOTES r4), so F>16 geometries stay on lax.conv rather
    than extrapolating the rule beyond its measurements.  (An r5 ledger
    entry initially blamed a long64 'regression' on F=64 dispatch — that
    was a config mix-up, see ROUND_NOTES r5 'long64: CORRECTED'.)"""
    impl = _TCONV_OVERRIDE or os.environ.get("MVOC_TCONV_IMPL", "auto")
    if impl == "auto":
        impl = ("stack3" if (n_rows <= _tconv_max_rows()
                             and n_frames <= TCONV_STACK3_MAX_FRAMES)
                else None)
    return tconv3_stack3 if impl == "stack3" else None


def maybe_matmul_conv(x: jax.Array, kernel: jax.Array, *,
                      strides, padding, out_dtype) -> Optional[jax.Array]:
    """Route an exact conv to its probed matmul form, or None for lax.conv.

    Covers the two hot patterns only: 2D 3x3 stride-1 pad-(1,1) on
    [N,H,W,C], and 3D (3,1,1) stride-1 pad-((1,1),0,0) on [B,F,H,W,C].
    Everything else (1x1 shortcuts, strided downsample, VAE shapes)
    returns None and stays on the stock nn.Conv path.
    """
    nd = kernel.ndim - 2
    if nd == 2:
        if (kernel.shape[0], kernel.shape[1]) != (3, 3):
            return None
        if tuple(strides) != (1, 1) or tuple(padding) != ((1, 1), (1, 1)):
            return None
        form = spatial_form(int(kernel.shape[2]), int(x.shape[1]),
                            int(x.shape[2]))
        if form is None:
            return None
        return form(x, kernel, out_dtype=out_dtype)
    if nd == 3:
        if tuple(kernel.shape[:3]) != (3, 1, 1):
            return None
        if (tuple(strides) != (1, 1, 1)
                or tuple(padding) != ((1, 1), (0, 0), (0, 0))):
            return None
        n_rows = 1
        for d in x.shape[:-1]:
            n_rows *= int(d)
        form = temporal_form(n_rows, int(x.shape[1]))
        if form is None:
            return None
        return form(x, kernel, out_dtype=out_dtype)
    return None
