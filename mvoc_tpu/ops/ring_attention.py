"""Ring (blockwise) attention over an ICI mesh axis for long-video configs.

The reference is fixed at 16 frames and has no sequence parallelism
(SURVEY.md §2.4/§5: no ring/blockwise/Ulysses anywhere; temporal attention
reshapes to (b*h*w, 16, c) — reference: pnp_utils.py:185-189).  For the
64+ frame stretch configs the frame axis is sharded over the mesh's "seq"
axis and temporal self-attention runs as ring attention: each device keeps
its local query frames, while K/V shards rotate around the ring via
`ppermute`, accumulating with an online (flash-style) softmax.  Peak memory
per device is O(S_local^2) instead of O(S^2), and the K/V transfers ride
ICI neighbor links.

Used via `shard_map` (see `ring_sdpa`); inside-GSPMD use would require
manual-collective lowering, so the long-video pipeline wraps the temporal
attention call in shard_map explicitly.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _band_mask(q_pos: jax.Array, k_pos: jax.Array, window: int) -> jax.Array:
    """[Sq, Sk] boolean band mask: |q - k| <= window // 2 (the windowed
    temporal attention of models/layers.TransformerTemporalModel)."""
    return jnp.abs(q_pos[:, None] - k_pos[None, :]) <= window // 2


def ring_self_attention(
    q: jax.Array,  # [B, H, S_local, D] local query shard
    k: jax.Array,  # [B, H, S_local, D] local key shard
    v: jax.Array,  # [B, H, S_local, D] local value shard
    axis_name: str,
    axis_size: int,
    window: int | None = None,
) -> jax.Array:
    """Blockwise self-attention with K/V rotating around `axis_name`.

    Must be called inside `shard_map` with the sequence axis sharded over
    `axis_name` (axis_size shards).  Exact (online softmax in fp32), no
    [S, S] logits ever materialized beyond the local [S_loc, S_loc] block.
    `window` applies the band-limited (windowed temporal) mask on GLOBAL
    positions: each rotating K/V block gets its true sequence offset.
    """
    b, h, s_loc, d = q.shape
    scale = 1.0 / math.sqrt(d)
    qf = q.astype(jnp.float32) * scale
    neg = jnp.finfo(jnp.float32).min

    if axis_size == 1:
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, k.astype(jnp.float32))
        if window is not None and window < s_loc:
            pos = jnp.arange(s_loc)
            s = jnp.where(_band_mask(pos, pos, window), s, neg)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(q.dtype)

    perm = [(j, (j + 1) % axis_size) for j in range(axis_size)]
    my = jax.lax.axis_index(axis_name)
    q_pos = my * s_loc + jnp.arange(s_loc)

    def step(it, carry):
        m_prev, l_prev, acc, kc, vc = carry
        s = jnp.einsum("bhqd,bhkd->bhqk", qf, kc.astype(jnp.float32))
        if window is not None:
            # after `it` permutes this device holds the block that started
            # on device (my - it) mod n — its global positions follow
            src = jnp.mod(my - it, axis_size)
            k_pos = src * s_loc + jnp.arange(s_loc)
            s = jnp.where(_band_mask(q_pos, k_pos, window)[None, None], s, neg)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", p, vc.astype(jnp.float32))
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return m_new, l_new, acc, kc, vc

    m0 = jnp.full((b, h, s_loc, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((b, h, s_loc, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, s_loc, d), jnp.float32)
    # shard_map's varying-axis tracking (jax>=0.8): the zero carries are
    # device-invariant constants but the loop makes them vary over the ring
    # axis — mark them varying up front.
    if hasattr(jax.lax, "pcast"):
        mark = lambda x: jax.lax.pcast(x, (axis_name,), to="varying")
    else:  # pragma: no cover - older jax
        mark = lambda x: jax.lax.pvary(x, (axis_name,))
    m0, l0, acc0 = mark(m0), mark(l0), mark(acc0)
    _, l, acc, _, _ = jax.lax.fori_loop(
        0, axis_size, step, (m0, l0, acc0, k, v))
    return (acc / l).astype(q.dtype)


def ulysses_self_attention(
    q: jax.Array,  # [B, H, S_local, D] local shards, H divisible by axis size
    k: jax.Array,
    v: jax.Array,
    axis_name: str,
    axis_size: int,
    window: int | None = None,
) -> jax.Array:
    """DeepSpeed-Ulysses style context parallelism: one all-to-all swaps the
    sharded axis from sequence to heads, full-sequence attention runs
    locally on H/n heads, and a second all-to-all swaps back.  Two
    collectives total per attention (vs n-1 ppermutes for the ring) — the
    better trade when H divides the mesh axis and S_local is small.
    """
    b, h, s_loc, d = q.shape
    if axis_size == 1:
        return ring_self_attention(q, k, v, axis_name, 1, window=window)
    assert h % axis_size == 0, f"heads {h} not divisible by axis {axis_size}"

    def gather_seq(x):  # [B, H, S_loc, D] -> [B, H/n, S_full, D]
        # split the head axis across devices, concatenate the seq axis
        return jax.lax.all_to_all(
            x, axis_name, split_axis=1, concat_axis=2, tiled=True)

    qg, kg, vg = gather_seq(q), gather_seq(k), gather_seq(v)
    scale = 1.0 / math.sqrt(d)
    s = jnp.einsum("bhqd,bhkd->bhqk", qg.astype(jnp.float32) * scale,
                   kg.astype(jnp.float32))
    if window is not None and window < s_loc * axis_size:
        pos = jnp.arange(s_loc * axis_size)
        s = jnp.where(_band_mask(pos, pos, window)[None, None], s,
                      jnp.finfo(jnp.float32).min)
    p = jax.nn.softmax(s, axis=-1)
    og = jnp.einsum("bhqk,bhkd->bhqd", p, vg.astype(jnp.float32)).astype(q.dtype)

    # inverse all-to-all: heads back to full, sequence back to local
    return jax.lax.all_to_all(
        og, axis_name, split_axis=2, concat_axis=1, tiled=True)


def ring_sdpa(
    q: jax.Array,  # [B, S, H*D]
    k: jax.Array,
    v: jax.Array,
    heads: int,
    mesh: Mesh,
    axis_name: str = "seq",
    method: str = "ring",
    window: int | None = None,
) -> jax.Array:
    """Drop-in sdpa (models/layers.sdpa signature subset) running as
    context-parallel attention with the token axis S sharded over
    `mesh[axis_name]`.

    method: "ring" (K/V rotate, n-1 neighbor ppermutes) or "ulysses"
    (two all-to-alls, heads must divide the axis).  S must divide the axis
    size; B stays replicated (shard it over other axes outside if desired).
    window: band-limited attention on global positions (long-video windowed
    temporal attention).
    """
    shard_map = getattr(jax, "shard_map", None)
    if shard_map is None:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    b, s, inner = q.shape
    n = mesh.shape[axis_name]
    assert s % n == 0, f"seq {s} not divisible by axis {axis_name}={n}"
    d = inner // heads

    def to_heads(x):
        return x.reshape(b, s, heads, d).transpose(0, 2, 1, 3)  # [B, H, S, D]

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
    spec = P(None, None, axis_name, None)
    impl = {"ring": ring_self_attention, "ulysses": ulysses_self_attention}[method]

    fn = shard_map(
        functools.partial(impl, axis_name=axis_name, axis_size=n, window=window),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    out = fn(qh, kh, vh)  # [B, H, S, D]
    return out.transpose(0, 2, 1, 3).reshape(b, s, inner)
