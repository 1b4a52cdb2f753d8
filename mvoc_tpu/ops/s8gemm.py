"""Pallas s8 x s8 -> s32 GEMM with a fused dequantize epilogue.

Why this exists: the v5e MXU runs s8 at ~2x the bf16 rate (393.6 vs 196.8
peak TOPS), but XLA's int8 lowering never realized it on this workload —
the round-4 on-chip probe measured XLA int8 convs at 0.8-1.15x bf16 and
the full int8 step at a 1.9x LOSS (scripts/int8_probe.py, ROUND_NOTES r4).
The VERDICT r4 directive 3 follow-up: attempt the s8 GEMM as a Pallas
kernel — owning the tiling and keeping the s32 accumulator in VMEM with
the dequantize fused into the final store — and accept/reject on
measurement (scripts/s8_gemm_probe.py).

Contract matches ops/quantize.int8_matmul: x int8 [M, K] with per-row f32
scales, w int8 [K, N] with per-column f32 scales (QuantizedTensor layout),
output = (sum_k x*w) * sx[m] * sw[n] in bf16/f32.  The reference computes
everything in fp16 (/root/reference/i2vgen-xl/inverse.py:113-118); int8
has no reference counterpart.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    """CPU interpret mode for tests — the shared MVOC_PALLAS_INTERPRET
    knob, or MVOC_S8_INTERPRET to interpret ONLY this kernel (CI smokes
    of the int8 path where interpret-mode attention would be too slow)."""
    return bool(os.environ.get("MVOC_PALLAS_INTERPRET")
                or os.environ.get("MVOC_S8_INTERPRET"))

# Default blocking: s8 min tile is (32, 128); these are multiples.  VMEM at
# (512, 512, 512): x 256 KB + w 256 KB + acc(s32) 1 MB + out 512 KB — well
# under the ~16 MB budget, double-bufferable.
BLOCK_M = 512
BLOCK_N = 512
BLOCK_K = 512


def _kernel(x_ref, w_ref, sx_ref, sw_ref, out_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _epilogue():
        scale = sx_ref[:] * sw_ref[:]  # [bm,1] * [1,bn] -> [bm,bn] f32
        out_ref[:] = (acc_ref[:].astype(jnp.float32) * scale
                      ).astype(out_ref.dtype)


def _pad_to(x: jax.Array, axis: int, mult: int):
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("out_dtype", "bm", "bn", "bk"))
def s8_matmul(
    xq: jax.Array,       # [M, K] int8
    wq: jax.Array,       # [K, N] int8
    x_scale: jax.Array,  # [M] or [M, 1] f32 per-row scales
    w_scale: jax.Array,  # [N] or [1, N] f32 per-column scales
    *,
    out_dtype=jnp.bfloat16,
    bm: int = BLOCK_M,
    bn: int = BLOCK_N,
    bk: int = BLOCK_K,
) -> jax.Array:
    """[M, N] = dequant(xq @ wq) with the epilogue fused into the store."""
    m, k = xq.shape
    k2, n = wq.shape
    assert k == k2, (xq.shape, wq.shape)
    sx = x_scale.reshape(m, 1).astype(jnp.float32)
    sw = w_scale.reshape(1, n).astype(jnp.float32)

    bm_, bn_, bk_ = min(bm, m), min(bn, n), min(bk, k)
    xq = _pad_to(_pad_to(xq, 0, bm_), 1, bk_)
    wq = _pad_to(_pad_to(wq, 0, bk_), 1, bn_)
    sx = _pad_to(sx, 0, bm_)
    sw = _pad_to(sw, 1, bn_)
    mp, kp = xq.shape
    _, np_ = wq.shape
    grid = (mp // bm_, np_ // bn_, kp // bk_)

    out = pl.pallas_call(
        functools.partial(_kernel, n_k=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm_, bk_), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk_, bn_), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((bm_, 1), lambda i, j, kk: (i, 0)),
            pl.BlockSpec((1, bn_), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm_, bn_), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm_, bn_), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * kp * np_, transcendentals=0,
            bytes_accessed=mp * kp + kp * np_ + 2 * mp * np_),
        interpret=_interpret(),
    )(xq, wq, sx, sw)
    return out[:m, :n]
