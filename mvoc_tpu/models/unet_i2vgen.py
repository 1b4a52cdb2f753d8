"""TPU-native I2VGen-XL 3D UNet (flax.linen, channels-last).

Re-implements the denoising UNet the reference drives through diffusers'
`I2VGenXLUNet` plus its custom forward `I2VGenXLUnetExtension.forward`
(reference: pipelines/pipeline_i2vgen_xl.py:103-362), including:

* per-frame context assembly: 77 text tokens + 64 image-latent tokens + 4
  CLIP-image tokens = 145-token cross-attention context per frame
  (reference: pipeline_i2vgen_xl.py:204-261),
* `image_latents_first` -> proj_in -> temporal encoder -> channel concat
  conditioning (reference: pipeline_i2vgen_xl.py:264-282),
* time + fps micro-conditioning embeddings, summed then repeated per frame
  (reference: pipeline_i2vgen_xl.py:182-197),
* `multi_frame_guidance`: per-frame CLIP image embeddings / image-latent
  tokens instead of broadcasting frame 0 (reference:
  pipeline_i2vgen_xl.py:150-151, 211-212),
* functional PnP injection sites (spatial/temporal attention Q/K in
  up_blocks {1:[1,2],2:[0,1,2],3:[0,1,2]}, resnet / temp-conv / out-conv
  activations in up_blocks[3]; see mvoc_tpu/pnp.py).

Architecture facts (diffusers I2VGenXLUNet as loaded from the HF
checkpoint, reference: pipeline_i2vgen_xl.py:420-443 and SURVEY.md §2.2):
block_out_channels (320, 640, 1280, 1280), layers_per_block 2, 4 down / 4 up
blocks (3 cross-attn down + plain down; plain up + 3 cross-attn up),
cross_attention_dim 1024, attention head dim 64 (heads = channels // 64),
8-head transformer_in, GroupNorm(32).

Everything is shape-static and jit/scan-friendly; sampling loops compile to
a single `lax.scan` (see pipeline/).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mvoc_tpu import pnp as pnp_lib
from mvoc_tpu.ops.quantize import QuantConv, QuantDense
from mvoc_tpu.models.layers import (
    Attention,
    BasicTransformerBlock,
    Downsample2D,
    FeedForward,
    GroupNorm,
    LayerNorm,
    ResnetBlock2D,
    TemporalConvLayer,
    TimestepEmbedding,
    Transformer2DModel,
    TransformerTemporalModel,
    Upsample2D,
    effective_natural_layout,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    cross_attention_dim: int = 1024
    attention_head_dim: int = 64  # heads = block_channels // this
    transformer_in_heads: int = 8
    # transformer_in per-head dim; None = attention_head_dim.  Derived from
    # the checkpoint's to_q shape at load time (infer_geometry_from_state_dict)
    # so a different diffusers wiring fails loudly instead of silently.
    transformer_in_head_dim: Optional[int] = None
    # image_latents_temporal_encoder attention geometry (diffusers
    # I2VGenXLTransformerTemporalEncoder(dim=in_ch, heads=2, head_dim=in_ch));
    # head dim likewise shape-derived at load time when None.
    img_temporal_encoder_heads: int = 2
    img_temporal_encoder_head_dim: Optional[int] = None
    norm_eps: float = 1e-5
    # long-video extension: band-limited temporal attention width (frames
    # attend within +-window/2); None = full attention (reference behavior)
    temporal_window: Optional[int] = None
    # memory: bound transformer FF GEGLU intermediates (rows per chunk on
    # the flattened token axis); 0 disables. 32768 rows * 2*inner(2560)
    # bf16 = 168 MB peak at the widest block — fits 720p on one 16 GB chip.
    ff_chunk_rows: int = 32768
    # frame-major temporal transformers (no [B*H*W, F, C] layout transpose;
    # see layers.TransformerTemporalModel.natural_layout).  PnP temporal
    # edits run in the same layout via _temporal_qk_edit_natural — exact.
    temporal_natural_layout: bool = False
    # context parallelism for temporal attention over the mesh "seq" axis:
    # ("ring"|"ulysses", Mesh).  Exact; when combined with
    # temporal_natural_layout, CP wins and the temporal transformers run the
    # standard layout (layers.effective_natural_layout).
    temporal_cp: Optional[Any] = None
    # the active multi-device mesh (pipeline.enable_mesh threads it here):
    # Pallas attention kernels then dispatch inside shard_map over this mesh
    # (ops/attention.sharded_*) instead of falling back to XLA attention.
    attn_mesh: Optional[Any] = None
    # PnP injection placement (pnp.SiteMap); None = the reference's
    # I2VGen-XL map (pnp.I2VGEN_SITES).  A different backbone supplies its
    # own map here — the capture/consume machinery is placement-agnostic
    # (docs/BACKBONE_PNP.md).
    site_map: Optional[Any] = None

    @property
    def sites(self):
        return self.site_map if self.site_map is not None else pnp_lib.I2VGEN_SITES

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    def heads_for(self, channels: int) -> int:
        assert channels % self.attention_head_dim == 0
        return channels // self.attention_head_dim

    @staticmethod
    def from_diffusers_config(cfg: dict[str, Any]) -> "UNetConfig":
        return UNetConfig(
            in_channels=cfg.get("in_channels", 4),
            out_channels=cfg.get("out_channels", 4),
            block_out_channels=tuple(cfg.get("block_out_channels", (320, 640, 1280, 1280))),
            layers_per_block=cfg.get("layers_per_block", 2),
            norm_num_groups=cfg.get("norm_num_groups", 32),
            cross_attention_dim=cfg.get("cross_attention_dim", 1024),
            attention_head_dim=cfg.get("attention_head_dim", 64),
        )

    @staticmethod
    def from_pretrained(checkpoint_dir: str) -> "UNetConfig":
        with open(os.path.join(checkpoint_dir, "unet", "config.json")) as f:
            return UNetConfig.from_diffusers_config(json.load(f))

    @staticmethod
    def tiny() -> "UNetConfig":
        """Small config for tests/CI — no 5 GB checkpoint needed (SURVEY.md §7.8)."""
        return UNetConfig(
            block_out_channels=(8, 16, 32, 32),
            norm_num_groups=4,
            cross_attention_dim=16,
            attention_head_dim=4,
            transformer_in_heads=2,
        )


def _adaptive_avg_pool2d(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """torch.nn.AdaptiveAvgPool2d semantics, channels-last [B, H, W, C].

    Bin i spans [floor(i*H/out), ceil((i+1)*H/out)); implemented with an
    integral image so it vectorizes (no per-cell slicing)."""
    b, h, w, c = x.shape
    oh, ow = out_hw

    def pool_axis(arr, size, out_size, axis):
        starts = (jnp.arange(out_size) * size) // out_size
        ends = -((-(jnp.arange(out_size) + 1) * size) // out_size)  # ceil
        csum = jnp.cumsum(arr, axis=axis)
        csum = jnp.concatenate([jnp.zeros_like(jax.lax.slice_in_dim(csum, 0, 1, axis=axis)), csum], axis=axis)
        hi = jnp.take(csum, ends, axis=axis)
        lo = jnp.take(csum, starts, axis=axis)
        return (hi - lo) / (ends - starts).reshape((-1,) + (1,) * (arr.ndim - axis - 1))

    x = pool_axis(x.astype(jnp.float32), h, oh, axis=1)
    x = pool_axis(x, w, ow, axis=2)
    return x


class DownBlock3D(nn.Module):
    """resnets + temp_convs xN, optional downsampler.  Returns
    (hidden, res_samples) like diffusers unet_3d_blocks.DownBlock3D."""

    out_channels: int
    num_layers: int
    add_downsample: bool
    norm_num_groups: int
    norm_eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, num_frames):
        res_samples = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                self.out_channels, eps=self.norm_eps, groups=self.norm_num_groups,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            x = TemporalConvLayer(
                self.out_channels, groups=self.norm_num_groups,
                dtype=self.dtype, name=f"temp_convs_{i}",
            )(x, num_frames)
            res_samples.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            res_samples.append(x)
        return x, res_samples


class CrossAttnDownBlock3D(nn.Module):
    out_channels: int
    num_layers: int
    add_downsample: bool
    heads: int
    dim_head: int
    cross_attention_dim: int
    norm_num_groups: int
    norm_eps: float
    ff_chunk_rows: int = 0
    temporal_window: Optional[int] = None
    temporal_natural_layout: bool = False
    temporal_cp: Optional[Any] = None
    attn_mesh: Optional[Any] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, num_frames):
        res_samples = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(
                self.out_channels, eps=self.norm_eps, groups=self.norm_num_groups,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb)
            x = TemporalConvLayer(
                self.out_channels, groups=self.norm_num_groups,
                dtype=self.dtype, name=f"temp_convs_{i}",
            )(x, num_frames)
            x = Transformer2DModel(
                self.out_channels, self.heads, self.dim_head, self.cross_attention_dim,
                norm_num_groups=self.norm_num_groups, ff_chunk_rows=self.ff_chunk_rows,
                attn_mesh=self.attn_mesh,
                dtype=self.dtype, name=f"attentions_{i}",
            )(x, context)
            x = TransformerTemporalModel(
                self.out_channels, self.heads, self.dim_head,
                norm_num_groups=self.norm_num_groups, window=self.temporal_window,
                ff_chunk_rows=self.ff_chunk_rows,
                natural_layout=self.temporal_natural_layout,
                context_parallel=self.temporal_cp[0] if self.temporal_cp else None,
                cp_mesh=self.temporal_cp[1] if self.temporal_cp else None,
                attn_mesh=self.attn_mesh,
                dtype=self.dtype, name=f"temp_attentions_{i}",
            )(x, num_frames)
            res_samples.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            res_samples.append(x)
        return x, res_samples


class UNetMidBlock3DCrossAttn(nn.Module):
    channels: int
    heads: int
    dim_head: int
    cross_attention_dim: int
    norm_num_groups: int
    norm_eps: float
    num_layers: int = 1
    ff_chunk_rows: int = 0
    temporal_window: Optional[int] = None
    temporal_natural_layout: bool = False
    temporal_cp: Optional[Any] = None
    attn_mesh: Optional[Any] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, num_frames):
        x = ResnetBlock2D(
            self.channels, eps=self.norm_eps, groups=self.norm_num_groups,
            dtype=self.dtype, name="resnets_0",
        )(x, temb)
        x = TemporalConvLayer(
            self.channels, groups=self.norm_num_groups, dtype=self.dtype, name="temp_convs_0",
        )(x, num_frames)
        for i in range(self.num_layers):
            x = Transformer2DModel(
                self.channels, self.heads, self.dim_head, self.cross_attention_dim,
                norm_num_groups=self.norm_num_groups, ff_chunk_rows=self.ff_chunk_rows,
                attn_mesh=self.attn_mesh,
                dtype=self.dtype, name=f"attentions_{i}",
            )(x, context)
            x = TransformerTemporalModel(
                self.channels, self.heads, self.dim_head,
                norm_num_groups=self.norm_num_groups, window=self.temporal_window,
                ff_chunk_rows=self.ff_chunk_rows,
                natural_layout=self.temporal_natural_layout,
                context_parallel=self.temporal_cp[0] if self.temporal_cp else None,
                cp_mesh=self.temporal_cp[1] if self.temporal_cp else None,
                attn_mesh=self.attn_mesh,
                dtype=self.dtype, name=f"temp_attentions_{i}",
            )(x, num_frames)
            x = ResnetBlock2D(
                self.channels, eps=self.norm_eps, groups=self.norm_num_groups,
                dtype=self.dtype, name=f"resnets_{i + 1}",
            )(x, temb)
            x = TemporalConvLayer(
                self.channels, groups=self.norm_num_groups,
                dtype=self.dtype, name=f"temp_convs_{i + 1}",
            )(x, num_frames)
        return x


@dataclasses.dataclass(frozen=True)
class FreeUConfig:
    """FreeU (arXiv 2309.11497) up-block re-weighting — the reference
    exposes enable_freeu/disable_freeu passthroughs on the pipeline
    (reference: pipeline_i2vgen_xl.py:950-976).  b1/b2 amplify backbone
    features, s1/s2 attenuate the (Fourier-low-passed) skip features in the
    two lowest-resolution up blocks."""

    s1: float = 0.9
    s2: float = 0.2
    b1: float = 1.1
    b2: float = 1.2


def _fourier_filter(x: jax.Array, threshold: int, scale: float) -> jax.Array:
    """Scale the low-frequency (centered) box of the spatial FFT — FreeU's
    skip-feature filter.  x: [BF, H, W, C] channels-last."""
    bf, h, w, c = x.shape
    xf = jnp.fft.fftshift(jnp.fft.fft2(x.astype(jnp.complex64), axes=(1, 2)), axes=(1, 2))
    cy, cx = h // 2, w // 2
    yy = jnp.abs(jnp.arange(h) - cy) < threshold
    xx = jnp.abs(jnp.arange(w) - cx) < threshold
    mask = jnp.where(yy[:, None] & xx[None, :], scale, 1.0)
    xf = xf * mask[None, :, :, None]
    out = jnp.fft.ifft2(jnp.fft.ifftshift(xf, axes=(1, 2)), axes=(1, 2))
    return jnp.real(out).astype(x.dtype)


def apply_freeu(block_index: int, hidden: jax.Array, skip: jax.Array,
                freeu: Optional[FreeUConfig]):
    """Re-weight (backbone hidden, skip) at the start of up blocks 0 and 1."""
    if freeu is None or block_index > 1:
        return hidden, skip
    b = freeu.b1 if block_index == 0 else freeu.b2
    s = freeu.s1 if block_index == 0 else freeu.s2
    c = hidden.shape[-1]
    scale = jnp.concatenate(
        [jnp.full((c // 2,), b, hidden.dtype), jnp.ones((c - c // 2,), hidden.dtype)]
    )
    hidden = hidden * scale
    skip = _fourier_filter(skip, threshold=1, scale=s)
    return hidden, skip


def _capture_qk(rec, site_id):
    def cap(q, k):
        rec[site_id] = (q, k)
        return q, k
    return cap


def _capture_act(rec, site_id):
    def cap(x):
        rec[site_id] = x
        return x
    return cap


def _spatial_qk_edit(pnp, h, w, site_id=None, rec=None):
    if rec is not None:
        if pnp is not None and pnp.capture_weight is not None:
            def cap_stream(q, k):
                rec[site_id] = pnp_lib.stream_capture_spatial(q, k, pnp, h, w)
                return q, k
            return cap_stream
        if pnp is not None:  # pre-composited capture: store S, 1 branch-equiv
            def cap(q, k):
                rec[site_id] = pnp_lib.precomposite_spatial(q, k, pnp, h, w)
                return q, k
            return cap
        return _capture_qk(rec, site_id)
    if pnp is None:
        return None
    if pnp.mode == "consume":
        fq, fk = pnp.features[site_id]
        return lambda q, k: pnp_lib.consume_spatial_qk(q, k, fq, fk, pnp, h, w)
    if pnp.mode == "consume_pre":
        sq, sk = pnp.features[site_id]
        return lambda q, k: pnp_lib.consume_spatial_precomposited(q, k, sq, sk, pnp, h, w)
    return lambda q, k: pnp_lib.inject_spatial_qk(q, k, pnp, h, w)


def _temporal_qk_edit(pnp, h, w, site_id=None, rec=None, natural=False):
    if natural:
        return _temporal_qk_edit_natural(pnp, h, w, site_id, rec)
    if rec is not None:
        if pnp is not None and pnp.capture_weight is not None:
            def cap_stream(q, k):
                rec[site_id] = pnp_lib.stream_capture_temporal(q, k, pnp, h, w)
                return q, k
            return cap_stream
        if pnp is not None:
            def cap(q, k):
                rec[site_id] = pnp_lib.precomposite_temporal(q, k, pnp, h, w)
                return q, k
            return cap
        return _capture_qk(rec, site_id)
    if pnp is None:
        return None
    if pnp.mode == "consume":
        fq, fk = pnp.features[site_id]
        return lambda q, k: pnp_lib.consume_temporal_qk(q, k, fq, fk, pnp, h, w)
    if pnp.mode == "consume_pre":
        sq, sk = pnp.features[site_id]
        return lambda q, k: pnp_lib.consume_temporal_precomposited(q, k, sq, sk, pnp, h, w)
    return lambda q, k: pnp_lib.inject_temporal_qk(q, k, pnp, h, w)


def _temporal_qk_edit_natural(pnp, h, w, site_id=None, rec=None):
    """Temporal Q/K edit for frame-major tokens [B, F, hw, C]: flattening the
    leading (B, F) axes gives exactly the SPATIAL edit layout, so the spatial
    edit/capture/consume functions apply with the soft mask and the temporal
    gate (the semantics the reference uses at temporal sites —
    pnp_utils.py:805-809)."""

    def flat(fn):
        def wrapped(q, k):
            B, f, hw, c = q.shape
            q2, k2 = fn(q.reshape(B * f, hw, c), k.reshape(B * f, hw, c))
            return q2.reshape(B, f, hw, c), k2.reshape(B, f, hw, c)
        return wrapped

    if rec is not None:
        if pnp is not None and pnp.capture_weight is not None:
            def cap_stream(q, k):
                B, f, hw, c = q.shape
                rec[site_id] = pnp_lib.stream_capture_temporal_natural(
                    q.reshape(B * f, hw, c), k.reshape(B * f, hw, c), pnp, h, w)
                return q, k
            return cap_stream
        if pnp is not None:
            def cap(q, k):
                B, f, hw, c = q.shape
                rec[site_id] = pnp_lib.precomposite_spatial(
                    q.reshape(B * f, hw, c), k.reshape(B * f, hw, c),
                    pnp, h, w, soft=True)
                return q, k
            return cap

        def cap_raw(q, k):
            rec[site_id] = (q, k)
            return q, k
        return cap_raw
    if pnp is None:
        return None
    gate = pnp.gate_temporal
    if pnp.mode == "consume":
        fq, fk = pnp.features[site_id]

        def consume(q2, k2):
            fq2 = fq.reshape(-1, q2.shape[1], q2.shape[2])
            fk2 = fk.reshape(-1, k2.shape[1], k2.shape[2])
            return pnp_lib.consume_spatial_qk(
                q2, k2, fq2, fk2, pnp, h, w, soft=True, gate=gate)
        return flat(consume)
    if pnp.mode == "consume_pre":
        sq, sk = pnp.features[site_id]
        return flat(lambda q2, k2: pnp_lib.consume_spatial_precomposited(
            q2, k2, sq, sk, pnp, h, w, soft=True, gate=gate))
    return flat(lambda q2, k2: pnp_lib.inject_spatial_qk(
        q2, k2, pnp, h, w, soft=True, gate=gate))


def _conv_edit(pnp, h, w, site_id=None, rec=None):
    if rec is not None:
        if pnp is not None and pnp.capture_weight is not None:
            def cap_stream(x):
                rec[site_id] = pnp_lib.stream_capture_conv(x, pnp, h, w)
                return x
            return cap_stream
        if pnp is not None:
            def cap(x):
                rec[site_id] = pnp_lib.precomposite_conv(x, pnp, h, w)
                return x
            return cap
        return _capture_act(rec, site_id)
    if pnp is None:
        return None
    if pnp.mode == "consume":
        return lambda x: pnp_lib.consume_conv_features(x, pnp.features[site_id], pnp, h, w)
    if pnp.mode == "consume_pre":
        return lambda x: pnp_lib.consume_conv_precomposited(x, pnp.features[site_id], pnp, h, w)
    return lambda x: pnp_lib.inject_conv_features(x, pnp, h, w)


class UpBlock3D(nn.Module):
    out_channels: int
    num_layers: int
    add_upsample: bool
    norm_num_groups: int
    norm_eps: float
    block_index: int = 0  # position in up_blocks, for PnP site lookup
    site_map: Optional[Any] = None  # pnp.SiteMap; None = I2VGEN_SITES
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_samples, temb, num_frames, upsample_size=None, pnp=None,
                 freeu=None, capture=None):
        sites = self.site_map if self.site_map is not None else pnp_lib.I2VGEN_SITES
        resnet_sites = sites.resnet_at(self.block_index)
        tconv_sites = sites.temp_conv_at(self.block_index)
        for i in range(self.num_layers):
            x, skip = apply_freeu(self.block_index, x, res_samples[-1 - i], freeu)
            x = jnp.concatenate([x, skip], axis=-1)
            hcur, wcur = x.shape[1], x.shape[2]
            x = ResnetBlock2D(
                self.out_channels, eps=self.norm_eps, groups=self.norm_num_groups,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb, pnp_edit=_conv_edit(
                pnp, hcur, wcur, f"resnet_{self.block_index}_{i}", capture)
                if i in resnet_sites else None)
            x = TemporalConvLayer(
                self.out_channels, groups=self.norm_num_groups,
                dtype=self.dtype, name=f"temp_convs_{i}",
            )(x, num_frames, pnp_edit=_conv_edit(
                pnp, hcur, wcur, f"tconv_{self.block_index}_{i}", capture)
                if i in tconv_sites else None)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x, upsample_size)
        return x


class CrossAttnUpBlock3D(nn.Module):
    out_channels: int
    num_layers: int
    add_upsample: bool
    heads: int
    dim_head: int
    cross_attention_dim: int
    norm_num_groups: int
    norm_eps: float
    block_index: int = 0
    ff_chunk_rows: int = 0
    temporal_window: Optional[int] = None
    temporal_natural_layout: bool = False
    temporal_cp: Optional[Any] = None
    attn_mesh: Optional[Any] = None
    site_map: Optional[Any] = None  # pnp.SiteMap; None = I2VGEN_SITES
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_samples, temb, context, num_frames, upsample_size=None,
                 pnp=None, freeu=None, capture=None, pab_cache=None, pab_rec=None):
        pab_on = pab_cache is not None or pab_rec is not None
        sites = self.site_map if self.site_map is not None else pnp_lib.I2VGEN_SITES
        spatial_sites = sites.spatial_at(self.block_index)
        temporal_sites = sites.temporal_at(self.block_index)
        resnet_sites = sites.resnet_at(self.block_index)
        tconv_sites = sites.temp_conv_at(self.block_index)
        for i in range(self.num_layers):
            x, skip = apply_freeu(self.block_index, x, res_samples[-1 - i], freeu)
            x = jnp.concatenate([x, skip], axis=-1)
            hcur, wcur = x.shape[1], x.shape[2]
            x = ResnetBlock2D(
                self.out_channels, eps=self.norm_eps, groups=self.norm_num_groups,
                dtype=self.dtype, name=f"resnets_{i}",
            )(x, temb, pnp_edit=_conv_edit(
                pnp, hcur, wcur, f"resnet_{self.block_index}_{i}", capture)
                if i in resnet_sites else None)
            x = TemporalConvLayer(
                self.out_channels, groups=self.norm_num_groups,
                dtype=self.dtype, name=f"temp_convs_{i}",
            )(x, num_frames, pnp_edit=_conv_edit(
                pnp, hcur, wcur, f"tconv_{self.block_index}_{i}", capture)
                if i in tconv_sites else None)
            x = Transformer2DModel(
                self.out_channels, self.heads, self.dim_head, self.cross_attention_dim,
                norm_num_groups=self.norm_num_groups, ff_chunk_rows=self.ff_chunk_rows,
                attn_mesh=self.attn_mesh,
                dtype=self.dtype, name=f"attentions_{i}",
            )(x, context,
              attn1_qk_edit=_spatial_qk_edit(
                  pnp, hcur, wcur, f"spatial_{self.block_index}_{i}", capture)
              if i in spatial_sites else None,
              pab=(pab_cache, pab_rec, f"sp{self.block_index}_{i}")
              if pab_on else None)
            x = TransformerTemporalModel(
                self.out_channels, self.heads, self.dim_head,
                norm_num_groups=self.norm_num_groups, window=self.temporal_window,
                ff_chunk_rows=self.ff_chunk_rows,
                natural_layout=self.temporal_natural_layout,
                context_parallel=self.temporal_cp[0] if self.temporal_cp else None,
                cp_mesh=self.temporal_cp[1] if self.temporal_cp else None,
                attn_mesh=self.attn_mesh,
                dtype=self.dtype, name=f"temp_attentions_{i}",
            )(x, num_frames,
              attn1_qk_edit=_temporal_qk_edit(
                  pnp, hcur, wcur, f"temporal_{self.block_index}_{i}", capture,
                  natural=effective_natural_layout(
                      self.temporal_natural_layout,
                      self.temporal_cp[0] if self.temporal_cp else None))
              if i in temporal_sites else None,
              pab=(pab_cache, pab_rec, f"tm{self.block_index}_{i}")
              if pab_on else None)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x, upsample_size)
        return x


class ImageLatentsTemporalEncoder(nn.Module):
    """diffusers I2VGenXLTransformerTemporalEncoder: LN -> self-attn ->
    +residual -> FF(gelu) -> +residual, over [B*H*W, F, C=in_channels]."""

    dim: int
    heads: int
    head_dim: Optional[int] = None  # None -> dim (diffusers default wiring)
    attn_mesh: Optional[Any] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = Attention(
            query_dim=self.dim, heads=self.heads,
            dim_head=self.head_dim or self.dim,
            attn_mesh=self.attn_mesh,
            dtype=self.dtype, name="attn1",
        )(h)
        x = h + x
        h = FeedForward(
            dim=self.dim, inner_dim=self.dim * 4, activation="gelu",
            dtype=self.dtype, name="ff",
        )(x)
        return h + x


class I2VGenXLUNet(nn.Module):
    """Forward signature mirrors the reference's extension forward
    (pipeline_i2vgen_xl.py:109-122) with channels-last tensors:

    sample:              [B, F, H, W, C_in]  noisy latents
    timestep:            scalar or [B] int
    fps:                 scalar or [B] int
    image_latents_first: [B, F, H, W, C_in]  first-frame VAE latents tiled
                         (temporal-encoder conditioning path)
    image_latents:       [B, F, H, W, C_in]  per-frame VAE latents (context
                         tokens; only frame 0 used unless multi_frame_guidance)
    image_embeddings:    [B, F, D_img]  per-frame CLIP image embeddings
    encoder_hidden_states: [B, 77, D_ctx] text embeddings
    pnp:                 optional PnPState (see mvoc_tpu/pnp.py)
    returns              [B, F, H, W, C_out] predicted noise
    """

    config: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jax.Array,
        timestep: jax.Array,
        fps: jax.Array,
        image_latents_first: jax.Array,
        image_latents: jax.Array,
        image_embeddings: jax.Array,
        encoder_hidden_states: jax.Array,
        pnp: Optional[pnp_lib.PnPState] = None,
        multi_frame_guidance: bool = False,
        freeu: Optional[FreeUConfig] = None,
        cached_encoder: Optional[tuple] = None,
        return_encoder: bool = False,
        encoder_reuse_depth: Optional[int] = None,
        pnp_capture: bool = False,
        pab_cache: Optional[dict] = None,
        pab_capture: bool = False,
    ) -> jax.Array:
        """cached_encoder / return_encoder implement training-free encoder
        reuse (arXiv 2312.09608 'Faster Diffusion'): UNet down+mid features
        drift slowly across adjacent denoising steps, so a sampler may reuse
        a cached (mid_features, skip_stack) tuple for several steps and only
        run the up blocks — MVOC's PnP injection sites all live in the up
        blocks, so injection fidelity is unaffected.  Defaults preserve the
        exact reference semantics.

        encoder_reuse_depth = k makes the reuse PARTIAL-DEPTH: only the
        features of down blocks k.. and the mid block are cached/reused; the
        stem + down blocks 0..k-1 (the high-resolution skips — the bulk of
        the cache bytes) are recomputed every step.  Cuts the cache ~4x at
        720p (k=2) so reuse fits a 16 GB chip, at the cost of re-running the
        cheap-to-store-but-recomputable shallow blocks.

        pab_capture / pab_cache implement PAB-style attention-output
        broadcast (arXiv 2408.12588): with pab_capture the up-block
        attention outputs are sown into the "attn_out" collection; a later
        step passing that dict as pab_cache SKIPS every up-block attention
        sublayer (qkv + sdpa + out-proj, including any PnP Q/K edit) and
        reuses the cached outputs — the residual stream, convs and FFs stay
        fresh.  Approximate by construction; 1-interval (never cached) is
        the exactness switch."""
        cfg = self.config
        b, f, h, w, c_in = sample.shape
        ch0 = cfg.block_out_channels[0]

        # 1-3. time + fps embeddings (pipeline_i2vgen_xl.py:166-197)
        timestep = jnp.broadcast_to(jnp.atleast_1d(timestep), (b,))
        fps = jnp.broadcast_to(jnp.atleast_1d(fps), (b,))
        t_emb = timestep_embedding(timestep, ch0).astype(self.dtype)
        t_emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype, name="time_embedding")(t_emb)
        fps_emb = timestep_embedding(fps, ch0).astype(self.dtype)
        fps_emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype, name="fps_embedding")(fps_emb)
        emb = t_emb + fps_emb
        emb = jnp.repeat(emb, f, axis=0)  # [B*F, emb]

        # 4. context embeddings: per frame [text 77 | image-latent 64 | image 4]
        # (pipeline_i2vgen_xl.py:199-261)
        if not multi_frame_guidance:
            image_embeddings = jnp.broadcast_to(
                image_embeddings[:, 0:1], (b, f, image_embeddings.shape[-1])
            )
        # image-latent context tokens from conv tower + adaptive pool
        n_ctx_frames = f if multi_frame_guidance else 1
        il = image_latents[:, :n_ctx_frames].reshape((b * n_ctx_frames, h, w, c_in))
        il = QuantConv(c_in * 8, (3, 3), padding=1, dtype=self.dtype,
                     name="image_latents_context_embedding_0")(il)
        il = nn.silu(il)
        il = _adaptive_avg_pool2d(il, (32, 32)).astype(self.dtype)
        il = QuantConv(c_in * 16, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                     name="image_latents_context_embedding_3")(il)
        il = nn.silu(il)
        il = QuantConv(cfg.cross_attention_dim, (3, 3), strides=(2, 2), padding=1, dtype=self.dtype,
                     name="image_latents_context_embedding_5")(il)
        n_img_tokens = il.shape[1] * il.shape[2]
        il_tokens = il.reshape(b, n_ctx_frames, n_img_tokens, cfg.cross_attention_dim)
        il_tokens = jnp.broadcast_to(
            il_tokens, (b, f, n_img_tokens, cfg.cross_attention_dim)
        ) if n_ctx_frames == 1 else il_tokens

        # CLIP image embedding -> 4 pseudo-tokens (context_embedding MLP)
        ie = QuantDense(cfg.time_embed_dim, dtype=self.dtype, name="context_embedding_0")(image_embeddings)
        ie = nn.silu(ie)
        ie = QuantDense(cfg.cross_attention_dim * c_in, dtype=self.dtype, name="context_embedding_2")(ie)
        ie_tokens = ie.reshape(b, f, c_in, cfg.cross_attention_dim)

        text = jnp.broadcast_to(
            encoder_hidden_states[:, None],
            (b, f) + encoder_hidden_states.shape[1:],
        )
        context = jnp.concatenate([text, il_tokens, ie_tokens], axis=2)
        context = context.reshape(b * f, -1, cfg.cross_attention_dim).astype(self.dtype)

        # image_latents_first -> proj_in convs -> temporal encoder
        # (pipeline_i2vgen_xl.py:264-282)
        ilf = image_latents_first.reshape(b * f, h, w, c_in)
        ilf = QuantConv(c_in * 4, (1, 1), dtype=self.dtype, name="image_latents_proj_in_0")(ilf)
        ilf = nn.silu(ilf)
        ilf = QuantConv(c_in * 4, (3, 3), padding=1, dtype=self.dtype, name="image_latents_proj_in_2")(ilf)
        ilf = nn.silu(ilf)
        ilf = QuantConv(c_in, (3, 3), padding=1, dtype=self.dtype, name="image_latents_proj_in_4")(ilf)
        ilf = ilf.reshape(b, f, h, w, c_in).transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c_in)
        ilf = ImageLatentsTemporalEncoder(
            dim=c_in, heads=cfg.img_temporal_encoder_heads,
            head_dim=cfg.img_temporal_encoder_head_dim,
            attn_mesh=cfg.attn_mesh, dtype=self.dtype,
            name="image_latents_temporal_encoder",
        )(ilf)
        ilf = ilf.reshape(b, h, w, f, c_in).transpose(0, 3, 1, 2, 4).reshape(b * f, h, w, c_in)

        n_blocks = len(cfg.block_out_channels)
        depth = encoder_reuse_depth

        def run_stem_and_blocks(n_run: int):
            # 5. pre-process: channel concat + conv_in + transformer_in
            x = sample.reshape(b * f, h, w, c_in).astype(self.dtype)
            x = jnp.concatenate([x, ilf], axis=-1)
            x = QuantConv(ch0, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
            x = TransformerTemporalModel(
                ch0, cfg.transformer_in_heads,
                cfg.transformer_in_head_dim or cfg.attention_head_dim,
                norm_num_groups=cfg.norm_num_groups, window=cfg.temporal_window,
                ff_chunk_rows=cfg.ff_chunk_rows,
                natural_layout=cfg.temporal_natural_layout,
                attn_mesh=cfg.attn_mesh,
                dtype=self.dtype, name="transformer_in",
            )(x, f)

            # 6. down blocks (first n_run of them)
            res_stack = [x]
            for i in range(n_run):
                out_ch = cfg.block_out_channels[i]
                is_final = i == n_blocks - 1
                if not is_final:  # CrossAttnDownBlock3D
                    x, res = CrossAttnDownBlock3D(
                        out_channels=out_ch, num_layers=cfg.layers_per_block,
                        add_downsample=True, heads=cfg.heads_for(out_ch),
                        dim_head=cfg.attention_head_dim,
                        cross_attention_dim=cfg.cross_attention_dim,
                        norm_num_groups=cfg.norm_num_groups, norm_eps=cfg.norm_eps,
                        temporal_window=cfg.temporal_window, ff_chunk_rows=cfg.ff_chunk_rows,
                        temporal_natural_layout=cfg.temporal_natural_layout,
                        temporal_cp=cfg.temporal_cp, attn_mesh=cfg.attn_mesh,
                        dtype=self.dtype, name=f"down_blocks_{i}",
                    )(x, emb, context, f)
                else:  # DownBlock3D
                    x, res = DownBlock3D(
                        out_channels=out_ch, num_layers=cfg.layers_per_block,
                        add_downsample=False, norm_num_groups=cfg.norm_num_groups,
                        norm_eps=cfg.norm_eps, dtype=self.dtype, name=f"down_blocks_{i}",
                    )(x, emb, f)
                res_stack.extend(res)
            return x, res_stack

        # skip-stack entries per down block: num_layers (+1 when downsampled)
        def _entries_before_block(k: int) -> int:
            n = 1  # the conv_in/transformer_in entry
            for i in range(k):
                n += cfg.layers_per_block + (1 if i < n_blocks - 1 else 0)
            return n

        if cached_encoder is None:
            x, res_stack = run_stem_and_blocks(n_blocks)
            # 7. mid block
            x = UNetMidBlock3DCrossAttn(
                channels=cfg.block_out_channels[-1],
                heads=cfg.heads_for(cfg.block_out_channels[-1]),
                dim_head=cfg.attention_head_dim,
                cross_attention_dim=cfg.cross_attention_dim,
                norm_num_groups=cfg.norm_num_groups, norm_eps=cfg.norm_eps,
                temporal_window=cfg.temporal_window, ff_chunk_rows=cfg.ff_chunk_rows,
                temporal_natural_layout=cfg.temporal_natural_layout,
                temporal_cp=cfg.temporal_cp, attn_mesh=cfg.attn_mesh,
                dtype=self.dtype, name="mid_block",
            )(x, emb, context, f)
            if depth is not None:
                # partial-depth cache: only the deep skips + mid go in
                encoder_features = (x, tuple(res_stack[_entries_before_block(depth):]))
            else:
                encoder_features = (x, tuple(res_stack))
        elif depth is not None:
            # recompute the shallow blocks fresh, splice the cached deep part
            _, res_stack = run_stem_and_blocks(depth)
            x, deep_skips = cached_encoder
            res_stack = res_stack + list(deep_skips)
            encoder_features = cached_encoder
        else:
            x, res_stack = cached_encoder
            res_stack = list(res_stack)
            encoder_features = (x, tuple(res_stack))

        # 8. up blocks (3 resnets each)
        capture: Optional[dict] = {} if pnp_capture else None
        pab_rec: Optional[dict] = {} if pab_capture else None
        rev = tuple(reversed(cfg.block_out_channels))
        n_up_layers = cfg.layers_per_block + 1
        for i in range(n_blocks):
            out_ch = rev[i]
            is_final = i == n_blocks - 1
            res = res_stack[-n_up_layers:]
            res_stack = res_stack[:-n_up_layers]
            upsample_size = res_stack[-1].shape[1:3] if (not is_final and res_stack) else None
            if i == 0:  # UpBlock3D
                x = UpBlock3D(
                    out_channels=out_ch, num_layers=n_up_layers, add_upsample=not is_final,
                    norm_num_groups=cfg.norm_num_groups, norm_eps=cfg.norm_eps,
                    block_index=i, site_map=cfg.site_map,
                    dtype=self.dtype, name=f"up_blocks_{i}",
                )(x, res, emb, f, upsample_size, pnp, freeu, capture)
            else:  # CrossAttnUpBlock3D
                x = CrossAttnUpBlock3D(
                    out_channels=out_ch, num_layers=n_up_layers, add_upsample=not is_final,
                    heads=cfg.heads_for(out_ch), dim_head=cfg.attention_head_dim,
                    cross_attention_dim=cfg.cross_attention_dim,
                    norm_num_groups=cfg.norm_num_groups, norm_eps=cfg.norm_eps,
                    temporal_window=cfg.temporal_window, ff_chunk_rows=cfg.ff_chunk_rows,
                    temporal_natural_layout=cfg.temporal_natural_layout,
                    temporal_cp=cfg.temporal_cp, attn_mesh=cfg.attn_mesh,
                    block_index=i, site_map=cfg.site_map,
                    dtype=self.dtype, name=f"up_blocks_{i}",
                )(x, res, emb, context, f, upsample_size, pnp, freeu, capture,
                  pab_cache=pab_cache, pab_rec=pab_rec)

        # 9. post-process (+ out-conv PnP injection, pnp_utils.py:1108-1159)
        x = GroupNorm(cfg.norm_num_groups, epsilon=cfg.norm_eps, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = QuantConv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(x)
        if not cfg.sites.out_conv:
            pass  # this backbone's site map has no out-conv injection site
        elif capture is not None:
            if pnp is not None and pnp.capture_weight is not None:
                capture["out_conv"] = pnp_lib.stream_capture_conv(
                    x, pnp, x.shape[1], x.shape[2])
            elif pnp is not None:
                capture["out_conv"] = pnp_lib.precomposite_conv(
                    x, pnp, x.shape[1], x.shape[2])
            else:
                capture["out_conv"] = x
        elif pnp is not None:
            if pnp.mode == "consume":
                x = pnp_lib.consume_conv_features(
                    x, pnp.features["out_conv"], pnp, x.shape[1], x.shape[2])
            elif pnp.mode == "consume_pre":
                x = pnp_lib.consume_conv_precomposited(
                    x, pnp.features["out_conv"], pnp, x.shape[1], x.shape[2])
            else:
                x = pnp_lib.inject_conv_features(x, pnp, x.shape[1], x.shape[2])
        if capture is not None:
            for site_id, val in capture.items():
                self.sow("pnp_features", site_id, val)
        if pab_rec is not None:
            for site_id, val in pab_rec.items():
                self.sow("attn_out", site_id, val)
        out = x.reshape(b, f, h, w, cfg.out_channels)
        if return_encoder:
            return out, encoder_features
        return out
