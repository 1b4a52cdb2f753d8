"""Pallas fused (flash) attention for TPU.

The reference reaches fused SDPA through torch/CUDA
(`F.scaled_dot_product_attention`, reference: pnp_utils.py:684-686,
862-864).  Here the hot path — spatial self-attention with seq = h*w up to
14400 tokens per frame at 720p latents — is a Pallas flash kernel with
online softmax: Q tiles stream against K/V resident in VMEM, fp32
accumulation, no [Sq, Sk] logits materialized in HBM.

Temporal attention (seq = 16 frames) and cross-attention (145 context
tokens) have tiny key dimensions where flash brings nothing; they take the
XLA path in models/layers.sdpa, which XLA fuses well.

The kernel is shape-generic: sequences are padded to the Q/K block sizes
and masked with -inf inside the kernel.  `interpret=True` runs it on CPU
for tests.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(-1e30)

# dispatch threshold: below this seq length the XLA path wins
FLASH_MIN_SEQ = 1024


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, seq_k: int, scale: float):
    """One (batch*heads, q-block) program: stream K/V blocks, online softmax.

    q_ref: [block_q, d]; k_ref/v_ref: [padded_sk, d] (VMEM-resident);
    o_ref: [block_q, d].
    """
    # matmuls run on the INPUT dtype (bf16 on TPU -> full MXU rate) with
    # fp32 accumulation via preferred_element_type; upcasting q/k/v to fp32
    # first would drop the MXU to its fp32 rate (~4x slower).  Softmax
    # statistics and the output accumulator stay fp32.
    q = q_ref[...]
    block_q, d = q.shape
    padded_sk = k_ref.shape[0]
    n_kb = padded_sk // block_k

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[pl.ds(i * block_k, block_k), :]
        v = v_ref[pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [block_q, block_k] fp32
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + i * block_k
        s = jnp.where(col < seq_k, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, n_kb, body, (m0, l0, acc0))
    o_ref[...] = (acc / l).astype(o_ref.dtype)


def _pad_to(x: jax.Array, size: int, axis: int) -> jax.Array:
    pad = -x.shape[axis] % size
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pick_block(seq: int, target: int, multiple: int = 16) -> int:
    """Largest divisor of `seq` that is <= target and a multiple of
    `multiple` (TPU sublane tiling) — avoids materializing padded copies of
    multi-GB q/k/v tensors when the sequence doesn't divide a power of two
    (720p latents: h*w = 14400).  Falls back to `target` (with padding)."""
    best = 0
    for cand in range(multiple, target + 1, multiple):
        if seq % cand == 0:
            best = cand
    return best or target


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,  # [B, H, Sq, D]
    k: jax.Array,  # [B, H, Sk, D]
    v: jax.Array,  # [B, H, Sk, D]
    block_q: int = 0,   # 0 = auto (divisor of Sq)
    block_k: int = 0,   # 0 = auto (divisor of Sk)
    interpret: bool = False,
) -> jax.Array:
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = block_q or _pick_block(sq, 512)
    block_k = block_k or _pick_block(sk, 1024)
    scale = 1.0 / math.sqrt(d)

    qf = _pad_to(q.reshape(b * h, sq, d), block_q, axis=1)
    kf = _pad_to(k.reshape(b * h, sk, d), block_k, axis=1)
    vf = _pad_to(v.reshape(b * h, sk, d), block_k, axis=1)
    padded_sq, padded_sk = qf.shape[1], kf.shape[1]

    grid = (b * h, padded_sq // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, seq_k=sk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, padded_sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, padded_sk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, padded_sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 96),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :sq].reshape(b, h, sq, d)


def use_flash(seq_q: int, seq_k: int, d: int) -> bool:
    """Dispatch policy: flash for long self-attention sequences on TPU."""
    if os.environ.get("MVOC_DISABLE_FLASH"):
        return False
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:  # pragma: no cover
        return False
    return platform == "tpu" and seq_q >= FLASH_MIN_SEQ and seq_k >= FLASH_MIN_SEQ
