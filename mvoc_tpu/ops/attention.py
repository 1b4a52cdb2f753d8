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
    # statistics and the output accumulator stay fp32.  The 1/sqrt(d) scale
    # is folded into q ONCE (fp32 multiply, one rounding back to the input
    # dtype — standard flash practice) instead of scaling every
    # [block_q, block_k] logits tile on the VPU.
    q = q_ref[...]
    block_q, d = q.shape
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)
    padded_sk = k_ref.shape[0]
    n_kb = padded_sk // block_k
    # K-padding mask only when the sequence doesn't fill the padded extent;
    # the common divisible case skips the per-tile iota/where entirely.
    need_mask = seq_k != padded_sk

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[pl.ds(i * block_k, block_k), :]
        v = v_ref[pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [block_q, block_k] fp32
        if need_mask:
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
    # block sizes decided by round-4 hardware A/Bs (TPU_RUNS_r04.log):
    # q=512 stands (q=256 lost 0.8%, q=1024 was noise); k=512 lost 1.7%.
    # Those A/Bs ran at 512px (seq 4096, where 512/1024 DIVIDE the seq);
    # at 720p (seq 14400) _pick_block falls back to divisors 480/960 —
    # fractional MXU tiles (480 = 3.75x128).  MVOC_FLASH_BLOCK_Q/K force
    # aligned blocks with padding instead (the kernel masks K by seq_k and
    # the padded q rows are sliced off) for the 720p A/B.
    env_bq = int(os.environ.get("MVOC_FLASH_BLOCK_Q", 0))
    env_bk = int(os.environ.get("MVOC_FLASH_BLOCK_K", 0))
    block_q = block_q or env_bq or _pick_block(sq, 512)
    if not block_k and env_bk and sk > 1024:
        block_k = env_bk
    if not block_k:
        if sk <= 1024:
            # short K (cross-attention: 145 context tokens): ONE K block,
            # padded up to the 128-lane tile — the whole softmax stays in
            # VMEM instead of XLA's HBM round-trips over padded fp32 logits
            block_k = -(-sk // 128) * 128
        else:
            block_k = _pick_block(sk, 1024)
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
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :sq].reshape(b, h, sq, d)


def _frame_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float):
    """Per-pixel frame attention, merged head-group rows.

    q/k/v/o_ref: [s_blk, M, D] (M = g*F merged head-group x frame rows);
    bias_ref: [M, M] fp32 additive block-diagonal (+band) bias.  For each
    pixel s the [M, M] logits tile lives entirely in VMEM: matmul -> bias ->
    softmax -> pv without a single HBM round-trip — the XLA lowering of the
    same math materializes the logits between softmax stages, which is the
    dominant cost of temporal attention at 512px (measured ~0.06 s/step in
    max-subtract traffic alone)."""
    bias = bias_ref[...]
    q = q_ref[...]  # [s_blk, M, D]
    k = k_ref[...]
    v = v_ref[...]
    # batched over the pixel axis: [s, M, D] x [s, N, D] -> [s, M, N]; the
    # fp32 logits block stays in VMEM through softmax and the pv matmul
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale + bias
    m = jnp.max(logits, axis=2, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=2, keepdims=True)
    o_ref[...] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("f", "heads", "interpret",
                                             "sf_layout"))
def frame_attention(
    q: jax.Array,  # [B, F, S, H*D] frame-major; or [S, F, H*D] (sf_layout)
    k: jax.Array,
    v: jax.Array,
    f: int,
    heads: int,
    bias: jax.Array,  # [M, M] fp32 additive (block-diag x band), M = g*F
    sf_layout: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Self-attention across the F frame axis independently per pixel s —
    the temporal-attention hot op (reference reaches it through torch SDPA
    on [B*H*W, F, C] tokens, pnp_utils.py:862-864).

    Heads are merged in groups of g (g*F <= 128, see layers._head_group_size)
    so the per-pixel matmuls fill the 128x128 MXU; the block-diagonal bias
    keeps per-head softmax exact.  Grid: (B*X groups, S blocks); everything
    per pixel stays in VMEM."""
    if sf_layout:
        s, f_, inner = q.shape
        b = 1
    else:
        b, f_, s, inner = q.shape
    assert f_ == f
    d = inner // heads
    from mvoc_tpu.models.layers import _head_group_size  # shared policy

    g = _head_group_size(heads, f)
    x = heads // g
    m = g * f
    assert bias.shape == (m, m)
    scale = 1.0 / math.sqrt(d)

    if sf_layout:
        def pack(t):
            # [S, F, X, G, D] -> [X, S, G, F, D] -> [X, S, M, D]
            t = t.reshape(s, f, x, g, d)
            return t.transpose(2, 0, 3, 1, 4).reshape(x, s, m, d)
    else:
        def pack(t):
            t = t.reshape(b, f, s, x, g, d)
            return t.transpose(0, 3, 2, 4, 1, 5).reshape(b * x, s, m, d)

    qm, km, vm = pack(q), pack(k), pack(v)
    bx = qm.shape[0]
    # (an s-pair d-block-diagonal "folding" variant was measured in round 3
    # and DELETED: the zero-padded [2M,2D]x[2D,2M] matmul 4x'es the
    # temporal-attention flops and lost 12-15% at both 512px and 720p —
    # TPU_RUNS_r03.log fold2_512 / fold2_720)
    m_eff, d_eff, s_eff = m, d, s

    # fp32 logits block [s_blk, M, M] must fit VMEM alongside q/k/v tiles.
    # s_blk=64 decided by round-4 hardware A/B: 128 measured a dead tie
    # (0.8521 vs 0.8526 steps/s, TPU_RUNS_r04.log ab_frame_sblk128_retry)
    s_blk = _pick_block(s_eff, 64, multiple=8)
    if s_eff % s_blk:
        pad = -s_eff % s_blk
        qm = jnp.pad(qm, ((0, 0), (0, pad), (0, 0), (0, 0)))
        km = jnp.pad(km, ((0, 0), (0, pad), (0, 0), (0, 0)))
        vm = jnp.pad(vm, ((0, 0), (0, pad), (0, 0), (0, 0)))
    s_pad = qm.shape[1]

    grid = (bx, s_pad // s_blk)
    spec = pl.BlockSpec((None, s_blk, m_eff, d_eff), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_frame_kernel, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec,
                  pl.BlockSpec((m_eff, m_eff), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bx, s_pad, m_eff, d_eff), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1024 * 1024 * 96),
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bx * s_eff * m_eff * m_eff * d_eff,
            bytes_accessed=3 * qm.size * q.dtype.itemsize,
            transcendentals=bx * s_eff * m_eff * m_eff,
        ),
        interpret=interpret,
    )(qm, km, vm, bias.astype(jnp.float32))
    out = out[:, :s_eff]
    if sf_layout:
        out = out.reshape(x, s, g, f, d).transpose(1, 3, 0, 2, 4)
        return out.reshape(s, f, inner)
    out = out.reshape(b, x, s, g, f, d).transpose(0, 4, 2, 1, 3, 5)
    return out.reshape(b, f, s, inner)


def env_interpret() -> bool:
    """MVOC_PALLAS_INTERPRET=1 runs the kernels in Pallas interpret mode —
    the CI/virtual-CPU-mesh switch that lets the sharded-kernel dispatch
    path execute (and be parity-tested) without TPU hardware."""
    return bool(os.environ.get("MVOC_PALLAS_INTERPRET"))


def use_frame_kernel() -> bool:
    """Dispatch policy for the Pallas frame-attention kernel (TPU only;
    MVOC_PALLAS_INTERPRET force-enables for CPU-mesh tests)."""
    if os.environ.get("MVOC_DISABLE_FLASH"):
        return False
    if env_interpret():
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def use_flash(seq_q: int, seq_k: int, d: int) -> bool:
    """Dispatch policy: flash whenever the QUERY sequence is long — both
    long self-attention (sk == sq) and cross-attention (sk = 145 context
    tokens, where the win is keeping the [sq, sk] softmax in VMEM)."""
    if os.environ.get("MVOC_DISABLE_FLASH"):
        return False
    if env_interpret():
        return seq_q >= FLASH_MIN_SEQ
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:  # pragma: no cover
        return False
    return platform == "tpu" and seq_q >= FLASH_MIN_SEQ


# ---------------------------------------------------------------------------
# shard_map wrappers: the kernels under a multi-device mesh
# ---------------------------------------------------------------------------
#
# A pallas_call is an opaque custom-call the GSPMD partitioner cannot shard —
# left inside a >1-device jit it forces replication/all-gathers around the
# hottest op in the model.  These wrappers instead run the kernel INSIDE
# shard_map: GSPMD reshards q/k/v to an explicitly chosen layout (batch/head/
# pixel axes split across the mesh), every device runs the kernel on its
# local block, and the surrounding program keeps its own shardings.  Both
# attention families are embarrassingly parallel along the chosen axes —
# spatial flash over (batch*frames, heads) rows, frame attention over pixels
# — so the kernel region itself is communication-free; the reshard in/out
# rides ICI exactly like the collectives GSPMD already inserts around the
# XLA attention path.  (Reference keeps fused SDPA always on through torch:
# pnp_utils.py:684-686, 862-864.)


def _shard_map(**kwargs):
    fn = getattr(jax, "shard_map", None)
    if fn is None:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as fn
    # a pallas_call's out_shape carries no varying-mesh-axes (vma) type, so
    # shard_map's replication checker cannot verify it — disable the check
    # for these kernel-only bodies (every output IS varying over the axes
    # its in_specs name; there is no cross-device invariant to verify)
    import inspect

    params = inspect.signature(fn).parameters
    flag = "check_vma" if "check_vma" in params else "check_rep"
    return functools.partial(fn, **{flag: False}, **kwargs)


def _assign_mesh_axes(mesh, dim_sizes: list[int]) -> list[tuple[str, ...]]:
    """Greedily assign mesh axes to tensor dims (in priority order).

    Each mesh axis (size > 1) goes to the FIRST dim it divides evenly given
    what's already assigned to that dim; axes that divide nothing are left
    unused (the kernel then runs replicated across them — correct, no
    speedup on that axis).  Returns per-dim axis-name tuples."""
    assigned: list[list[str]] = [[] for _ in dim_sizes]
    used: list[int] = [1] * len(dim_sizes)
    for name in mesh.axis_names:
        size = mesh.shape[name]
        if size <= 1:
            continue
        for i, dim in enumerate(dim_sizes):
            if dim % (used[i] * size) == 0:
                assigned[i].append(name)
                used[i] *= size
                break
    return [tuple(a) for a in assigned]


def sharded_flash_attention(
    q: jax.Array,  # [B, H, Sq, D]
    k: jax.Array,  # [B, H, Sk, D]
    v: jax.Array,
    mesh,
    interpret: bool = False,
) -> jax.Array:
    """Flash attention with (batch, heads, then query-blocks) split over the
    mesh.  Exact: every (b, h) row's attention is independent, and when the
    query axis is split each device still streams the FULL K/V (flash reads
    them blockwise anyway)."""
    from jax.sharding import PartitionSpec as P

    b, h, sq, d = q.shape
    b_ax, h_ax, q_ax = _assign_mesh_axes(mesh, [b, h, sq])
    qspec = P(b_ax or None, h_ax or None, q_ax or None, None)
    kvspec = P(b_ax or None, h_ax or None, None, None)  # full K/V per device
    fn = _shard_map()(
        lambda qq, kk, vv: flash_attention(qq, kk, vv, interpret=interpret),
        mesh=mesh, in_specs=(qspec, kvspec, kvspec), out_specs=qspec)
    return fn(q, k, v)


def sharded_frame_attention(
    q: jax.Array,  # [B, F, S, H*D] (natural) or [S, F, H*D] (sf_layout)
    k: jax.Array,
    v: jax.Array,
    f: int,
    heads: int,
    bias: jax.Array,  # [M, M] fp32, replicated
    mesh,
    sf_layout: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Frame (temporal) attention with the PIXEL axis split over the mesh.

    Temporal attention is per-pixel independent, so pixel sharding is
    communication-free inside the kernel; the frame axis stays FULL on every
    device (the activation arrives frame-sharded under the pipeline's "seq"
    layout — GSPMD's reshard here is the same all-to-all-class movement the
    XLA temporal path needs)."""
    from jax.sharding import PartitionSpec as P

    if sf_layout:
        s = q.shape[0]
        (s_ax,) = _assign_mesh_axes(mesh, [s])
        spec = P(s_ax or None, None, None)
    else:
        b, _, s, _ = q.shape
        s_ax, b_ax = _assign_mesh_axes(mesh, [s, b])
        spec = P(b_ax or None, None, s_ax or None, None)
    fn = _shard_map()(
        lambda qq, kk, vv, bb: frame_attention(
            qq, kk, vv, f, heads, bb, sf_layout=sf_layout,
            interpret=interpret),
        mesh=mesh, in_specs=(spec, spec, spec, P(None, None)),
        out_specs=spec)
    return fn(q, k, v, bias)
