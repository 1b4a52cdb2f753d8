"""Core network layers for the TPU-native I2VGen-XL stack (flax.linen).

Everything is channels-last (TPU/XLA's preferred conv layout):
  * per-frame ("2D") tensors:  [B*F, H, W, C]
  * temporal ("3D") tensors:   [B, F, H, W, C]
  * token tensors:             [B, S, C]

Layer semantics mirror the diffusers modules the reference exercises
(reference: i2vgen-xl/pipelines/pipeline_i2vgen_xl.py:103-362 uses
time_proj/time_embedding/fps_embedding/TransformerTemporalModel/
Transformer2DModel/ResnetBlock2D/TemporalConvLayer via the stock UNet blocks;
pnp_utils.py:563-1159 documents their internals), but the implementation is
JAX-first: pure functions of parameters, fp32 softmax/norm statistics, and
explicit PnP Q/K-edit hooks instead of monkey-patched processors.

Module names are chosen so the parameter pytree mirrors the HF checkpoint
key paths (see models/convert.py for the exact mapping rules).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# Drop-in nn.Conv/nn.Dense: identical (bitwise, tests/test_quantize.py)
# until ops/quantize.quantize_params installs int8 kernel leaves, at which
# point the w8a8 path dispatches (the `quantize: int8` approximate mode).
from mvoc_tpu.ops.quantize import QuantConv, QuantDense

# A QKEdit receives (q, k) immediately after the q/k projections (pre-head
# split) and returns edited (q, k).  This is the functional replacement for
# the reference's modified attention processors (pnp_utils.py:604-672).
QKEdit = Callable[[jax.Array, jax.Array], tuple[jax.Array, jax.Array]]


def timestep_embedding(
    timesteps: jax.Array,
    dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: int = 10000,
) -> jax.Array:
    """Sinusoidal timestep embedding (diffusers `Timesteps` semantics; the
    UNet builds time and fps embeddings from it — reference:
    pipeline_i2vgen_xl.py:182, 193)."""
    half_dim = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """linear_1 -> silu -> linear_2 (diffusers TimestepEmbedding)."""

    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jax.Array) -> jax.Array:
        sample = QuantDense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        sample = nn.silu(sample)
        sample = QuantDense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(sample)
        return sample


class GroupNorm(nn.Module):
    """GroupNorm with fp32 statistics, matching torch nn.GroupNorm semantics:
    normalizes over (all non-batch spatial dims, channel group).  Input is
    channels-last with a single leading batch dim."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        c = x.shape[-1]
        g = self.num_groups
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        b = x.shape[0]
        spatial_axes = tuple(range(1, x.ndim - 1))

        # Group statistics via per-channel moments — NO group reshape of the
        # full tensor (the [B, spatial, G, C/G] view forces XLA into a
        # materialized fp32 layout copy: 4.7 GB at 720p latents).  Only
        # [B, C]-sized fp32 arrays exist; the elementwise normalize+affine
        # chain fuses with bf16 in/out.
        xf = x.astype(jnp.float32)
        mean_c = jnp.mean(xf, axis=spatial_axes)          # [B, C]
        mean_g = mean_c.reshape(b, g, c // g).mean(axis=-1)
        mean_ch = jnp.repeat(mean_g, c // g, axis=-1)     # [B, C]
        bshape = (b,) + (1,) * len(spatial_axes) + (c,)
        # Second pass: centered second moment E[(x-mu)^2].  One extra fused
        # read of x vs the one-pass E[x^2]-E[x]^2 form, but immune to the
        # catastrophic cancellation that form hits when |mean| >> std —
        # real-checkpoint activations can sit there, and 500 inversion steps
        # amplify any variance error.  The subtract fuses into the reduction
        # (input fusion): still no full-size fp32 temp.
        cen2_c = jnp.mean(
            jnp.square(xf - mean_ch.reshape(bshape)), axis=spatial_axes)  # [B, C]
        var_g = cen2_c.reshape(b, g, c // g).mean(axis=-1)
        inv_g = jax.lax.rsqrt(var_g + self.epsilon)
        inv_ch = jnp.repeat(inv_g, c // g, axis=-1)
        # fold scale/bias into per-channel fp32 coefficients, then do the
        # full-tensor arithmetic in the INPUT dtype: one fused multiply-add,
        # no full-size fp32 temps (torch fp16 GroupNorm behaves the same)
        a_ch = (inv_ch * scale[None]).reshape(bshape).astype(orig_dtype)
        b_ch = (bias[None] - mean_ch * inv_ch * scale[None]).reshape(bshape).astype(orig_dtype)
        return x * a_ch + b_ch


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics (torch default eps 1e-5)."""

    epsilon: float = 1e-5
    use_bias: bool = True
    use_scale: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        c = x.shape[-1]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        xn = ((xf - mean) * jax.lax.rsqrt(var + self.epsilon)).astype(orig_dtype)
        if self.use_scale:
            xn = xn * self.param("scale", nn.initializers.ones, (c,), jnp.float32).astype(orig_dtype)
        if self.use_bias:
            xn = xn + self.param("bias", nn.initializers.zeros, (c,), jnp.float32).astype(orig_dtype)
        return xn


def sdpa(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    mask: Optional[jax.Array] = None,
    mesh: Optional[object] = None,
) -> jax.Array:
    """Scaled dot-product attention over [B, S, H*D] projections.

    Softmax in fp32 (bf16 accumulation is too lossy for 500-step inversion).
    Long self-attention sequences (spatial attention at 720p latents:
    seq = h*w = 14400) dispatch to the Pallas flash kernel on TPU; short
    sequences (temporal seq=16, cross-attn 145 tokens) take the XLA path.

    mesh: the active multi-device mesh, if any — the Pallas kernels then run
    inside shard_map (ops/attention.sharded_*) instead of being left as
    opaque custom-calls GSPMD would replicate around.
    """
    b, sq, inner = q.shape
    sk = k.shape[1]
    d = inner // heads

    from mvoc_tpu.ops import attention as flash

    mesh_active = mesh is not None and getattr(mesh, "size", 1) > 1
    if mask is None and flash.use_flash(sq, sk, d):
        qh = q.reshape(b, sq, heads, d).transpose(0, 2, 1, 3)
        kh = k.reshape(b, sk, heads, d).transpose(0, 2, 1, 3)
        vh = v.reshape(b, sk, heads, d).transpose(0, 2, 1, 3)
        if mesh_active:
            out = flash.sharded_flash_attention(
                qh, kh, vh, mesh, interpret=flash.env_interpret())
        else:
            # (the upstream jax.experimental.pallas TPU flash kernel was
            # A/B'd here round 4 and measured 0.46 vs 0.85 steps/s on the
            # default preset — this kernel is 1.85x faster on this
            # workload; TPU_RUNS_r04.log ab_flash_impl_jax)
            out = flash.flash_attention(qh, kh, vh,
                                        interpret=flash.env_interpret())
        return out.transpose(0, 2, 1, 3).reshape(b, sq, inner)

    # Short-sequence path (temporal seq=16, cross-attn 145 tokens).  The
    # tiny trailing dims pad badly on TPU (minor dim tiles to 128: a
    # [72000,5,16,16] fp32 logits buffer pads 8x to 2.75 GB), so huge row
    # counts are processed in chunks — sequential in the HLO schedule, one
    # padded buffer live at a time.
    ROW_CHUNK = 4096

    # short SELF-attention (sq == sk, e.g. frame axis F=16): dispatch to the
    # Pallas merged-head frame kernel on TPU — per-head matmuls of this
    # shape leave the MXU ~1% occupied and the XLA softmax round-trips the
    # logits through HBM (see ops/attention.frame_attention).  mask, when
    # given, is the [F, F] window band.
    if (sq == sk and sq <= 64
            and (mask is None or mask.shape == (sq, sk))):
        from mvoc_tpu.ops import attention as flash

        g = _head_group_size(heads, sq)
        if g > 1 and flash.use_frame_kernel():
            bias = _block_diag_bias(sq, g, mask)
            if mesh_active:
                return flash.sharded_frame_attention(
                    q, k, v, sq, heads, bias, mesh, sf_layout=True,
                    interpret=flash.env_interpret())
            return flash.frame_attention(q, k, v, sq, heads, bias,
                                         sf_layout=True,
                                         interpret=flash.env_interpret())

    def attend(qc, kc, vc):
        bc = qc.shape[0]
        scale = 1.0 / math.sqrt(d)
        qh = qc.reshape(bc, sq, heads, d).transpose(0, 2, 1, 3)
        kh = kc.reshape(bc, sk, heads, d).transpose(0, 2, 1, 3)
        vh = vc.reshape(bc, sk, heads, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) * scale
        if mask is not None:
            logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(vc.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        return out.transpose(0, 2, 1, 3).reshape(bc, sq, inner)

    if b <= ROW_CHUNK:
        return attend(q, k, v)
    outs = [
        attend(q[i : i + ROW_CHUNK], k[i : i + ROW_CHUNK], v[i : i + ROW_CHUNK])
        for i in range(0, b, ROW_CHUNK)
    ]
    return jnp.concatenate(outs, axis=0)


def _head_group_size(heads: int, f: int, max_rows: int = 128) -> int:
    """Largest divisor g of `heads` with g*f <= max_rows.

    Per-pixel frame attention is a batched [F, D] x [D, F] matmul with
    F ~ 16 — the MXU (128x128 systolic array) runs those at ~1% utilization.
    Packing g heads into one merged (g*F)-row matmul with a block-diagonal
    softmax mask computes g^2 head-pair blocks to use g (a g-fold FLOP
    waste) but fills the MXU tile, a large net win (measured ~1.2 -> >50
    TF/s at F=16, g=8 on v5e)."""
    best = 1
    for g in range(1, heads + 1):
        if heads % g == 0 and g * f <= max_rows:
            best = g
    return best


def _block_diag_bias(f: int, g: int, mask: Optional[jax.Array]) -> jax.Array:
    """Additive fp32 bias [g*f, g*f] for merged-head frame attention:
    0 within a head's own FxF block, -1e30 across heads (and outside the
    optional [F, F] boolean band mask)."""
    m = g * f
    head_id = jnp.arange(m) // f
    allowed = head_id[:, None] == head_id[None, :]
    if mask is not None:
        frame_id = jnp.arange(m) % f
        allowed = allowed & mask[frame_id[:, None], frame_id[None, :]]
    return jnp.where(allowed, 0.0, -1e30).astype(jnp.float32)


def sdpa_frames(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    heads: int,
    mask: Optional[jax.Array] = None,
    mesh: Optional[object] = None,
) -> jax.Array:
    """Attention across the FRAME axis of [B, F, S, H*D] tokens without
    re-laying the tensor out as [B*S, F, H*D] first.

    The standard temporal path transposes [B, F, H, W, C] -> [B*H*W, F, C]
    before/after every temporal transformer; those layout copies are ~14%
    of a composite step at 512px.  Here the tokens stay frame-major and the
    frame-vs-frame contraction is expressed directly.

    Heads are MERGED in groups of g (g*F <= 128 rows) into one batched
    matmul with a block-diagonal softmax bias — exact per-head attention
    (cross-head logits get -1e30 -> prob 0) at full MXU tile occupancy; the
    per-head formulation leaves the 128x128 systolic array ~1% occupied on
    [16, 64]x[64, 16] products.  mask: optional [F, F] boolean (windowed
    temporal attention), folded into the bias.
    """
    b, f, s, inner = q.shape
    d = inner // heads
    scale = 1.0 / math.sqrt(d)
    from mvoc_tpu.ops import attention as flash

    g = _head_group_size(heads, f)
    if g > 1 and flash.use_frame_kernel():
        bias = _block_diag_bias(f, g, mask)
        if mesh is not None and getattr(mesh, "size", 1) > 1:
            return flash.sharded_frame_attention(
                q, k, v, f, heads, bias, mesh,
                interpret=flash.env_interpret())
        return flash.frame_attention(q, k, v, f, heads, bias,
                                     interpret=flash.env_interpret())
    qh = q.reshape(b, f, s, heads, d)
    kh = k.reshape(b, f, s, heads, d)
    vh = v.reshape(b, f, s, heads, d)
    # logits laid out with the long s axis minor: [B, H, F, G, S] — the tiny
    # f/g axes stay off the 128-lane dim, so no 8x tile-padding blowup.
    logits = jnp.einsum(
        "bfshd,bgshd->bhfgs", qh, kh, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = jnp.where(mask[None, None, :, :, None], logits,
                           jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=3).astype(v.dtype)
    out = jnp.einsum("bhfgs,bgshd->bfshd", probs, vh)
    return out.reshape(b, f, s, inner)


class Attention(nn.Module):
    """Multi-head attention (diffusers `Attention`): to_q/to_k/to_v without
    bias, to_out.0 with bias.  Optional cross-attention context; optional
    PnP Q/K edit applied post-projection, pre-head-split (the exact point
    the reference edits — pnp_utils.py:604-668)."""

    query_dim: int
    heads: int
    dim_head: int
    out_bias: bool = True
    # frame-axis self-attention over [B, F, S, C] tokens (no [B*S, F, C]
    # layout transpose) — see sdpa_frames
    frame_axis: bool = False
    # context-parallel override: (q, k, v, heads) -> out replacing sdpa —
    # ring/Ulysses attention over the sharded frame axis (ops/ring_attention);
    # the impl carries its own window mask, so attn_mask is bypassed
    attn_impl: Optional[Callable] = None
    # active multi-device mesh: Pallas kernels dispatch inside shard_map
    # (ops/attention.sharded_*) so >1-device runs keep the fused kernels
    attn_mesh: Optional[object] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        encoder_hidden_states: Optional[jax.Array] = None,
        qk_edit: Optional[QKEdit] = None,
        attn_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        inner = self.heads * self.dim_head
        ctx = encoder_hidden_states if encoder_hidden_states is not None else hidden_states
        q = QuantDense(inner, use_bias=False, dtype=self.dtype, name="to_q")(hidden_states)
        k = QuantDense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = QuantDense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        if qk_edit is not None:
            q, k = qk_edit(q, k)
        if self.attn_impl is not None:
            out = self.attn_impl(q, k, v, self.heads)
        elif self.frame_axis:
            out = sdpa_frames(q, k, v, self.heads, mask=attn_mask,
                              mesh=self.attn_mesh)
        else:
            out = sdpa(q, k, v, self.heads, mask=attn_mask,
                       mesh=self.attn_mesh)
        out = QuantDense(self.query_dim, use_bias=self.out_bias, dtype=self.dtype, name="to_out_0")(out)
        return out


class FeedForward(nn.Module):
    """diffusers FeedForward.  activation: 'geglu' (net.0 = GEGLU proj to
    2*inner, gated gelu) or 'gelu' (net.0 = Linear+gelu).  net.2 = Linear.

    chunk_rows bounds the GEGLU intermediate: the hidden expansion of a
    720p-latent transformer is [72000*16, 2560] ≈ 5.5 GB bf16 if
    materialized whole (it OOMs a 16 GB chip); chunking the flattened token
    axis keeps peak memory at chunk_rows*2*inner while the matmuls stay
    MXU-sized.  FF is pointwise over tokens, so chunking is exact.

    Chunking only engages when the whole intermediate would exceed
    CHUNK_BYTE_THRESHOLD — at 512px latents everything fits comfortably and
    the chunk boundaries cost ~2% of a composite step (measured), so the
    cap self-disables there and engages at 720p where it is required."""

    CHUNK_BYTE_THRESHOLD = 2 << 30  # 2 GB

    dim: int
    inner_dim: Optional[int] = None  # default 4*dim
    activation: str = "geglu"
    chunk_rows: int = 0  # 0 = no chunking
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        inner = self.inner_dim or self.dim * 4
        proj_in = QuantDense(
            inner * 2 if self.activation == "geglu" else inner,
            dtype=self.dtype, name="net_0_proj")
        proj_out = QuantDense(self.dim, dtype=self.dtype, name="net_2")

        def ff(t):
            h = proj_in(t)
            if self.activation == "geglu":
                h, gate = jnp.split(h, 2, axis=-1)
                h = h * jax.nn.gelu(gate, approximate=False)
            elif self.activation == "gelu":
                h = jax.nn.gelu(h, approximate=False)
            else:
                raise ValueError(f"unknown activation {self.activation}")
            return proj_out(h)

        lead = x.shape[:-1]
        rows = 1
        for d in lead:
            rows *= d
        inter_cols = inner * 2 if self.activation == "geglu" else inner
        inter_bytes = rows * inter_cols * jnp.dtype(self.dtype).itemsize
        if (not self.chunk_rows or rows <= self.chunk_rows
                or inter_bytes <= self.CHUNK_BYTE_THRESHOLD):
            return ff(x)
        x2 = x.reshape(rows, x.shape[-1])
        outs = [
            ff(x2[i : i + self.chunk_rows])
            for i in range(0, rows, self.chunk_rows)
        ]
        return jnp.concatenate(outs, axis=0).reshape(*lead, self.dim)


class BasicTransformerBlock(nn.Module):
    """norm1->attn1(self) + norm2->attn2(cross or 2nd self) + norm3->ff,
    all residual (diffusers BasicTransformerBlock).

    double_self_attention=True makes attn2 a second self-attention — the
    configuration of all temporal transformers here (their `attn2` never
    receives encoder states: pipeline blocks call temp_attentions without
    encoder_hidden_states)."""

    dim: int
    heads: int
    dim_head: int
    double_self_attention: bool = False
    activation: str = "geglu"
    ff_chunk_rows: int = 0
    frame_axis: bool = False  # tokens are [B, F, S, C]; attend across F
    attn_impl: Optional[Callable] = None  # context-parallel self-attn override
    attn_mesh: Optional[object] = None  # sharded-kernel dispatch (see Attention)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        encoder_hidden_states: Optional[jax.Array] = None,
        attn1_qk_edit: Optional[QKEdit] = None,
        attn_mask: Optional[jax.Array] = None,
        pab: Optional[tuple] = None,
    ) -> jax.Array:
        # pab = (cache, rec, site): PAB-style attention-output broadcast
        # (arXiv 2408.12588).  cache: site->output dict — SKIP the attention
        # sublayer and reuse the prior step's output; rec: dict collected by
        # the caller to build the next cache.  The residual stream and FF
        # still run fresh every step (the PAB formulation).
        def run_attn(name: str, compute):
            if pab is None:
                return compute()
            cache, rec, site = pab
            key = f"{site}.{name}"
            out = cache[key] if cache is not None else compute()
            if rec is not None:
                rec[key] = out
            return out

        h1 = LayerNorm(dtype=self.dtype, name="norm1")(hidden_states)
        h = run_attn("a1", lambda: Attention(
            query_dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            frame_axis=self.frame_axis, attn_impl=self.attn_impl,
            attn_mesh=self.attn_mesh,
            dtype=self.dtype, name="attn1",
        )(h1, qk_edit=attn1_qk_edit, attn_mask=attn_mask))
        hidden_states = h + hidden_states

        h2 = LayerNorm(dtype=self.dtype, name="norm2")(hidden_states)
        ctx = None if self.double_self_attention else encoder_hidden_states
        h = run_attn("a2", lambda: Attention(
            query_dim=self.dim, heads=self.heads, dim_head=self.dim_head,
            frame_axis=self.frame_axis,
            attn_impl=self.attn_impl if self.double_self_attention else None,
            attn_mesh=self.attn_mesh,
            dtype=self.dtype, name="attn2",
        )(h2, encoder_hidden_states=ctx,
          attn_mask=attn_mask if self.double_self_attention else None))
        hidden_states = h + hidden_states

        h = LayerNorm(dtype=self.dtype, name="norm3")(hidden_states)
        h = FeedForward(dim=self.dim, activation=self.activation,
                        chunk_rows=self.ff_chunk_rows, dtype=self.dtype, name="ff")(h)
        return h + hidden_states


class Transformer2DModel(nn.Module):
    """Spatial transformer over per-frame tokens.

    Input [B*F, H, W, C] -> GroupNorm -> proj_in -> blocks over h*w tokens
    (cross-attending to `encoder_hidden_states` [B*F, S, ctx_dim]) ->
    proj_out -> +residual.  (diffusers Transformer2DModel, num_layers=1 in
    all I2VGen-XL blocks.)"""

    in_channels: int
    heads: int
    dim_head: int
    cross_attention_dim: int
    num_layers: int = 1
    norm_num_groups: int = 32
    ff_chunk_rows: int = 0
    attn_mesh: Optional[object] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        encoder_hidden_states: jax.Array,
        attn1_qk_edit: Optional[QKEdit] = None,
        pab: Optional[tuple] = None,
    ) -> jax.Array:
        bf, h, w, c = hidden_states.shape
        inner = self.heads * self.dim_head
        residual = hidden_states
        x = GroupNorm(self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm")(hidden_states)
        x = x.reshape(bf, h * w, c)
        x = QuantDense(inner, dtype=self.dtype, name="proj_in")(x)
        for i in range(self.num_layers):
            x = BasicTransformerBlock(
                dim=inner, heads=self.heads, dim_head=self.dim_head,
                ff_chunk_rows=self.ff_chunk_rows, attn_mesh=self.attn_mesh,
                dtype=self.dtype, name=f"transformer_blocks_{i}",
            )(x, encoder_hidden_states,
              attn1_qk_edit=attn1_qk_edit if i == 0 else None,
              pab=(pab[0], pab[1], f"{pab[2]}.b{i}") if pab else None)
        x = QuantDense(c, dtype=self.dtype, name="proj_out")(x)
        return x.reshape(bf, h, w, c) + residual


def effective_natural_layout(natural: bool, context_parallel,
                             warn: bool = False) -> bool:
    """The layout temporal transformers ACTUALLY run in.

    context_parallel (ring/Ulysses, ops/ring_attention) is implemented for
    the standard [B*H*W, F, C] token layout; combining it with the
    frame-major natural layout silently degraded to GSPMD all-gathers before
    (VERDICT r2 weak #2).  Both layouts compute identical math — natural
    only removes layout copies — so the CP request wins and the module runs
    the standard layout.  Callers building PnP Q/K edits must use this same
    function so the edit matches the executed layout."""
    if natural and context_parallel is not None:
        if warn:
            import warnings

            warnings.warn(
                "context_parallel=%r overrides temporal_natural_layout: "
                "ring/Ulysses attention runs in the standard [B*H*W, F, C] "
                "token layout (exact, same math)" % (context_parallel,),
                stacklevel=2)
        return False
    return natural


class TransformerTemporalModel(nn.Module):
    """Temporal transformer: attention across the frame axis per pixel.

    Input [B*F, H, W, C] + num_frames -> GroupNorm over the *joint*
    (F, H, W, group) statistics (the torch module normalizes the 5D
    [B,C,F,H,W] tensor) -> tokens [B*H*W, F, C] -> proj_in -> blocks
    (double self-attention) -> proj_out -> +residual."""

    in_channels: int
    heads: int
    dim_head: int
    num_layers: int = 1
    norm_num_groups: int = 32
    # long-video extension (absent in the reference, which is fixed at 16
    # frames — SURVEY.md §5): frames attend only within +-window/2 when set,
    # keeping temporal attention O(F*window) for 64+ frame configs.
    window: Optional[int] = None
    ff_chunk_rows: int = 0
    # keep tokens frame-major [B, F, H*W, C] and attend across F directly
    # (sdpa_frames) instead of transposing to [B*H*W, F, C] — same math,
    # no standalone layout copies.  Callers passing attn1_qk_edit must
    # build the edit for this layout (unet_i2vgen._temporal_qk_edit_natural).
    natural_layout: bool = False
    # context parallelism over the sharded frame axis: "ring" (K/V rotate
    # via ppermute) or "ulysses" (all-to-all head exchange) with cp_mesh the
    # device mesh whose "seq" axis shards frames (ops/ring_attention).
    # Exact; composes with `window` (band mask on global frame positions).
    # The ring/Ulysses impls operate on [B*H*W, F, C] tokens, so when BOTH
    # context_parallel and natural_layout are set, this module falls back to
    # the standard layout internally (same math — natural_layout only elides
    # layout copies) and warns once, instead of silently dropping CP.
    context_parallel: Optional[str] = None
    cp_mesh: Optional[object] = None
    attn_mesh: Optional[object] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        hidden_states: jax.Array,
        num_frames: int,
        attn1_qk_edit: Optional[QKEdit] = None,
        pab: Optional[tuple] = None,
    ) -> jax.Array:
        bf, h, w, c = hidden_states.shape
        b = bf // num_frames
        inner = self.heads * self.dim_head
        residual = hidden_states
        natural = effective_natural_layout(self.natural_layout,
                                           self.context_parallel, warn=True)
        # 5D groupnorm: stats over (F, H, W, C/G) per batch element.
        x = hidden_states.reshape(b, num_frames, h, w, c)
        x = GroupNorm(self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        if natural:
            x = x.reshape(b, num_frames, h * w, c)  # layout-preserving
        else:
            # [B, F, H, W, C] -> [B*H*W, F, C]
            x = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, num_frames, c)
        x = QuantDense(inner, dtype=self.dtype, name="proj_in")(x)
        attn_mask = None
        attn_impl = None
        if self.context_parallel is not None:
            import functools

            from mvoc_tpu.ops.ring_attention import ring_sdpa

            assert self.cp_mesh is not None, "context_parallel needs cp_mesh"
            attn_impl = functools.partial(
                ring_sdpa, mesh=self.cp_mesh, axis_name="seq",
                method=self.context_parallel,
                window=self.window if (self.window is not None
                                       and self.window < num_frames) else None)
        elif self.window is not None and self.window < num_frames:
            idx = jnp.arange(num_frames)
            attn_mask = (jnp.abs(idx[:, None] - idx[None, :]) <= self.window // 2)
        for i in range(self.num_layers):
            x = BasicTransformerBlock(
                dim=inner, heads=self.heads, dim_head=self.dim_head,
                double_self_attention=True,
                ff_chunk_rows=self.ff_chunk_rows,
                frame_axis=natural,
                attn_impl=attn_impl,
                attn_mesh=self.attn_mesh,
                dtype=self.dtype, name=f"transformer_blocks_{i}",
            )(x, attn1_qk_edit=attn1_qk_edit if i == 0 else None,
              attn_mask=attn_mask,
              pab=(pab[0], pab[1], f"{pab[2]}.b{i}") if pab else None)
        x = QuantDense(c, dtype=self.dtype, name="proj_out")(x)
        if natural:
            x = x.reshape(bf, h, w, c)
        else:
            x = x.reshape(b, h, w, num_frames, c).transpose(0, 3, 1, 2, 4).reshape(bf, h, w, c)
        return x + residual


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D (per-frame 2D), channels-last.

    norm1 -> silu -> conv1 -> (+time_emb via Linear(silu(temb))) -> norm2 ->
    silu -> conv2; shortcut 1x1 conv when channels change; optional
    `pnp_edit` applied to the residual-branch output *before* the shortcut
    add (exactly where the reference injects — pnp_utils.py:970-1004)."""

    out_channels: int
    eps: float = 1e-5
    groups: int = 32
    use_time_emb: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        temb: Optional[jax.Array] = None,
        pnp_edit: Optional[Callable[[jax.Array], jax.Array]] = None,
    ) -> jax.Array:
        in_c = x.shape[-1]
        h = GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = QuantConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        if self.use_time_emb and temb is not None:
            t = QuantDense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = GroupNorm(self.groups, epsilon=self.eps, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = QuantConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if pnp_edit is not None:
            h = pnp_edit(h)
        if in_c != self.out_channels:
            x = QuantConv(self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class TemporalConvLayer(nn.Module):
    """diffusers TemporalConvLayer: four (GN -> silu -> conv3d[k=(3,1,1)])
    stages with a residual connection; conv4 is zero-initialized so a fresh
    layer is the identity.  Input/output [B*F, H, W, C]; optional `pnp_edit`
    applied after the residual add (reference injects there —
    pnp_utils.py:1042-1088)."""

    in_dim: int
    out_dim: Optional[int] = None
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        num_frames: int,
        pnp_edit: Optional[Callable[[jax.Array], jax.Array]] = None,
    ) -> jax.Array:
        out_dim = self.out_dim or self.in_dim
        bf, hh, ww, c = x.shape
        b = bf // num_frames
        x5 = x.reshape(b, num_frames, hh, ww, c)
        identity = x5

        def tconv(h, dim, name, zero_init=False):
            h = GroupNorm(self.groups, epsilon=1e-5, dtype=self.dtype, name=f"{name}_norm")(h)
            h = nn.silu(h)
            init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
            return QuantConv(
                dim, (3, 1, 1), padding=((1, 1), (0, 0), (0, 0)),
                kernel_init=init, dtype=self.dtype, name=f"{name}_conv",
            )(h)

        h = tconv(x5, out_dim, "conv1")
        h = tconv(h, self.in_dim, "conv2")
        h = tconv(h, self.in_dim, "conv3")
        h = tconv(h, self.in_dim, "conv4", zero_init=True)
        h = (identity + h).reshape(bf, hh, ww, c)
        if pnp_edit is not None:
            h = pnp_edit(h)
        return h


class Downsample2D(nn.Module):
    """Strided 3x3 conv, torch padding=1 semantics."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return QuantConv(
            self.out_channels, (3, 3), strides=(2, 2), padding=1,
            dtype=self.dtype, name="conv",
        )(x)


class Upsample2D(nn.Module):
    """Nearest-neighbor x2 (or to explicit `output_size`) + 3x3 conv.
    `output_size` handles non-multiple-of-8 latents (e.g. 90x160 at 720p;
    the reference forwards upsample_size the same way —
    pipeline_i2vgen_xl.py:328-329)."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, output_size: Optional[tuple[int, int]] = None) -> jax.Array:
        bf, h, w, c = x.shape
        target = output_size or (h * 2, w * 2)
        # torch F.interpolate(nearest): out[i] = in[floor(i * h / H_out)]
        ys = (jnp.arange(target[0]) * (h / target[0])).astype(jnp.int32)
        xs = (jnp.arange(target[1]) * (w / target[1])).astype(jnp.int32)
        x = x[:, ys][:, :, xs]
        return QuantConv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
