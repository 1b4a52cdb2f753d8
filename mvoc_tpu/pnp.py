"""Functional plug-and-play (PnP) feature injection for multi-video composition.

The reference implements feature injection by monkey-patching diffusers module
forwards and setattr-ing mutable per-step state (`t`, `mask`,
`injection_schedule`) on 28 modules (reference: pnp_utils.py:48-167, 563-1159,
composite.py:38-69).  Under `jit` that is impossible and unnecessary: here the
UNet forward takes an explicit, trace-stable `PnPState` pytree and every
injection site is a pure `jnp.where(gate, composite, original)`.

Semantics replicated exactly from the reference:

* Branch layout: the UNet batch is ``[bg, obj_1..obj_N, uncond, cond]`` —
  N+3 chunks (reference: pipeline_i2vgen_xl.py:1675-1677; chunk_size =
  batch//5 for N=2 at pnp_utils.py:592, 747, 972, 1061, 1115).
* Attention sites inject **Q and K only** (V is computed but never written —
  pnp_utils.py:661-668, 811-823); conv sites inject full activations.
* Composite: ``base = base*(1-mask_j) + obj_j*mask_j`` looped j=1..N, so a
  *later* object wins overlaps (pnp_utils.py:643-662).  The result is written
  into BOTH the uncond and cond chunks (pnp_utils.py:664-668).
* ``inject_background`` selects the base: bg chunk if True else the cond
  chunk (pnp_utils.py:633-641, 786-794).  Conv-type sites always use bg
  (pnp_utils.py:974, 1063, 1117).
* Gate: inject when ``t ∈ schedule or t == 1000`` (pnp_utils.py:624, 778,
  970, 1059, 1114).
* Masks are nearest-resized to each attention resolution
  (pnp_utils.py:650, 807); conv sites run at full latent resolution and use
  the mask as-is.  We precompute the whole pyramid once instead of
  re-interpolating inside every call.

Site placement (reference: pnp_utils.py:706-715, 889-897, 1031-1037,
1099-1105, 1156-1159):

* spatial attn1 Q/K: up_blocks res_dict {1:[1,2], 2:[0,1,2], 3:[0,1,2]}
* temporal attn1 Q/K: same res_dict, temp_attentions
* resnet hidden states (pre-shortcut-add): up_blocks[3].resnets[0..2]
* temporal conv output (post-residual): up_blocks[3].temp_convs[0..2]
* conv_out output: unet.conv_out
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

def _freeze_sites(d) -> tuple:
    """{block: (layers…)} -> hashable ((block, (layers…)), …) sorted form."""
    return tuple(sorted((int(k), tuple(int(i) for i in v)) for k, v in d.items()))


@dataclasses.dataclass(frozen=True)
class SiteMap:
    """Which backbone sub-layers inject — a PARAMETER of the UNet, not a
    constant, so a different backbone (SVD, a CogVideoX-style DiT) can carry
    its own placement under the same capture/consume machinery
    (docs/BACKBONE_PNP.md).  Each field maps an up-block index to the
    sub-layer indices that inject, stored in frozen ((block, (layers…)), …)
    form so the map is hashable (UNet configs ride through jit closures).

    Construct with plain dicts via :meth:`make`.
    """

    spatial_attn: tuple = ()
    temporal_attn: tuple = ()
    resnet: tuple = ()
    temp_conv: tuple = ()
    out_conv: bool = True

    @staticmethod
    def make(spatial_attn=None, temporal_attn=None, resnet=None,
             temp_conv=None, out_conv: bool = True) -> "SiteMap":
        return SiteMap(
            spatial_attn=_freeze_sites(spatial_attn or {}),
            temporal_attn=_freeze_sites(temporal_attn or {}),
            resnet=_freeze_sites(resnet or {}),
            temp_conv=_freeze_sites(temp_conv or {}),
            out_conv=out_conv,
        )

    @staticmethod
    def _at(frozen: tuple, block: int) -> tuple:
        for b, layers in frozen:
            if b == block:
                return layers
        return ()

    def spatial_at(self, block: int) -> tuple:
        return self._at(self.spatial_attn, block)

    def temporal_at(self, block: int) -> tuple:
        return self._at(self.temporal_attn, block)

    def resnet_at(self, block: int) -> tuple:
        return self._at(self.resnet, block)

    def temp_conv_at(self, block: int) -> tuple:
        return self._at(self.temp_conv, block)

    def block_indices(self) -> set:
        """All up-block indices that carry at least one injection site."""
        return {b for field in (self.spatial_attn, self.temporal_attn,
                                self.resnet, self.temp_conv)
                for b, layers in field if layers}


# The reference's placement for the I2VGen-XL UNet (reference:
# pnp_utils.py:706-715, 889-897, 1031-1037, 1099-1105, 1156-1159) — the
# default SiteMap when UNetConfig.site_map is None.
I2VGEN_SITES = SiteMap.make(
    spatial_attn={1: (1, 2), 2: (0, 1, 2), 3: (0, 1, 2)},
    temporal_attn={1: (1, 2), 2: (0, 1, 2), 3: (0, 1, 2)},
    resnet={3: (0, 1, 2)},
    temp_conv={3: (0, 1, 2)},
    out_conv=True,
)

# Back-compat dict views of the default map (pre-round-5 public names).
SPATIAL_ATTN_SITES = dict(I2VGEN_SITES.spatial_attn)
TEMPORAL_ATTN_SITES = dict(I2VGEN_SITES.temporal_attn)
RESNET_SITES = dict(I2VGEN_SITES.resnet)
TEMP_CONV_SITES = dict(I2VGEN_SITES.temp_conv)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PnPState:
    """Per-step injection state threaded through the UNet forward.

    All fields are traced arrays so a `lax.scan` over denoising steps keeps a
    single compiled UNet.  Static branch count lives in the shapes.

    masks: dict keyed by (h, w) static latent resolutions → float arrays of
        shape [N, F, h, w] (object, frame, y, x) with values in {0, 1} —
        the THRESHOLDED binary masks, used by spatial attention and conv
        sites (the reference uses mask[1].to(fp16) there —
        pnp_utils.py:648, 986, 1071, 1128).
    masks_soft: same pyramid of the UN-thresholded bicubic-downscaled float
        masks — used by temporal attention (the reference uses mask[0]
        there — pnp_utils.py:805).  Defaults to `masks` when None.
    gate_spatial / gate_temporal / gate_conv: boolean scalars — precomputed
        outside as `(t ∈ schedule) | (t == 1000)` for the current step.
    inject_background: static python bool (affects attention sites only).
    """

    masks: Dict[Tuple[int, int], jax.Array]
    gate_spatial: jax.Array
    gate_temporal: jax.Array
    gate_conv: jax.Array
    masks_soft: Optional[Dict[Tuple[int, int], jax.Array]] = None
    inject_background: bool = dataclasses.field(metadata=dict(static=True), default=True)
    # two-pass execution: "fused" (default, all branches one batch),
    # "consume" (edit-branch batch of 2 + `features` captured from a prior
    # source-branch pass).  Capture itself is a UNet flag (pnp_capture).
    mode: str = dataclasses.field(metadata=dict(static=True), default="fused")
    features: Optional[Dict[str, tuple]] = None
    # STREAMED capture (one source branch per UNet call): the current
    # branch's per-site multiplier pyramids — dict keyed "qk_binary" /
    # "qk_soft" / "conv", each res -> [F, h, w].  When set, capture stores
    # x * weight and the branch terms SUM to the same S as batched
    # pre-composited capture (see build_capture_weights).
    capture_weight: Optional[Dict[str, Dict[Tuple[int, int], jax.Array]]] = None

    @property
    def num_objects(self) -> int:
        return next(iter(self.masks.values())).shape[0]

    @property
    def num_branches(self) -> int:
        return self.num_objects + 3

    def mask_at(self, h: int, w: int, soft: bool = False) -> jax.Array:
        table = self.masks_soft if (soft and self.masks_soft is not None) else self.masks
        try:
            return table[(h, w)]
        except KeyError:
            raise KeyError(
                f"no precomputed mask at resolution {(h, w)}; have {sorted(table)}"
            ) from None


def build_mask_pyramid(
    masks: np.ndarray, resolutions: list[tuple[int, int]]
) -> Dict[Tuple[int, int], np.ndarray]:
    """Nearest-resize per-object/frame masks to every injection resolution.

    masks: [N, F, H, W] float binary masks at full latent resolution.
    Matches torch.nn.functional.interpolate(mode='nearest') exactly
    (reference: pnp_utils.py:650, 807): output pixel (i, j) samples input
    pixel (floor(i*H/h), floor(j*W/w)).
    """
    n, f, H, W = masks.shape
    out: Dict[Tuple[int, int], np.ndarray] = {}
    for (h, w) in resolutions:
        if (h, w) == (H, W):
            out[(h, w)] = masks.astype(np.float32)
            continue
        ys = (np.arange(h) * (H / h)).astype(np.int64)
        xs = (np.arange(w) * (W / w)).astype(np.int64)
        out[(h, w)] = masks[:, :, ys][:, :, :, xs].astype(np.float32)
    return out


def _composite(base: jax.Array, objs: jax.Array, masks: jax.Array) -> jax.Array:
    """base, objs[j]: [...]; masks: [N, ...] broadcastable; later object wins."""
    n = objs.shape[0]
    for j in range(n):
        m = masks[j]
        base = base * (1.0 - m) + objs[j] * m
    return base


def _inject_chunks(x: jax.Array, injected: jax.Array, n_obj: int) -> jax.Array:
    """Overwrite the uncond + cond chunks (last two) with `injected`."""
    return jnp.concatenate([x[: n_obj + 1], injected, injected], axis=0)


def inject_spatial_qk(
    q: jax.Array, k: jax.Array, pnp: PnPState, h: int, w: int,
    soft: bool = False, gate: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Spatial-attention Q/K injection (reference: pnp_utils.py:624-672).

    q, k: [B*F, h*w, C] with B = N+3 branches.
    soft/gate: used by the natural-layout TEMPORAL sites, whose tokens
    [B, F, hw, C] flatten to exactly this layout but take the soft mask and
    the temporal gate (see unet_i2vgen._temporal_qk_edit).
    """
    n = pnp.num_objects
    B = pnp.num_branches
    bf, hw, c = q.shape
    f = bf // B
    mask = pnp.mask_at(h, w, soft=soft).astype(q.dtype).reshape(n, 1, f, hw, 1)

    def edit(x):
        xb = x.reshape(B, f, hw, c)
        base = xb[0:1] if pnp.inject_background else xb[B - 1 :]
        inj = _composite(base, xb[1 : n + 1][:, None], mask)
        return _inject_chunks(xb, inj, n).reshape(bf, hw, c)

    if gate is None:
        gate = pnp.gate_spatial
    return jnp.where(gate, edit(q), q), jnp.where(gate, edit(k), k)


def inject_temporal_qk(
    q: jax.Array, k: jax.Array, pnp: PnPState, h: int, w: int
) -> tuple[jax.Array, jax.Array]:
    """Temporal-attention Q/K injection (reference: pnp_utils.py:778-850).

    q, k: [B*h*w, F, C] with B = N+3 branches (row-major: branch, then pixel).
    Temporal sites use the SOFT (un-thresholded) mask — the reference reads
    mask[j][0], the bicubic-downscaled float mask (pnp_utils.py:805-809),
    rearranged so pixel positions gate rows and frames gate columns.
    """
    n = pnp.num_objects
    B = pnp.num_branches
    bhw, f, c = q.shape
    hw = bhw // B
    # [N, F, h, w] -> [N, 1, hw, F, 1]: pixel rows gate rows, frame gates cols.
    mask = pnp.mask_at(h, w, soft=True).astype(q.dtype).transpose(0, 2, 3, 1).reshape(n, 1, hw, f, 1)

    def edit(x):
        xb = x.reshape(B, hw, f, c)
        base = xb[0:1] if pnp.inject_background else xb[B - 1 :]
        inj = _composite(base, xb[1 : n + 1][:, None], mask)
        return _inject_chunks(xb, inj, n).reshape(bhw, f, c)

    gate = pnp.gate_temporal
    return jnp.where(gate, edit(q), q), jnp.where(gate, edit(k), k)


def inject_conv_features(x: jax.Array, pnp: PnPState, h: int, w: int) -> jax.Array:
    """Conv-site activation injection (reference: pnp_utils.py:970-1004,
    1059-1082, 1114-1146).  Base is ALWAYS the bg chunk.

    x: [B*F, h, w, C] channels-last activations.
    """
    n = pnp.num_objects
    B = pnp.num_branches
    bf, hh, ww, c = x.shape
    f = bf // B
    mask = pnp.mask_at(h, w).astype(x.dtype).reshape(n, 1, f, hh, ww, 1)

    xb = x.reshape(B, f, hh, ww, c)
    inj = _composite(xb[0:1], xb[1 : n + 1][:, None], mask)
    edited = _inject_chunks(xb, inj, n).reshape(bf, hh, ww, c)
    return jnp.where(pnp.gate_conv, edited, x)


def injection_gates(
    full_timesteps: np.ndarray,
    run_timesteps: np.ndarray,
    n_steps: int,
    pnp_f_t: float,
    pnp_spatial_attn_t: float,
    pnp_temp_attn_t: float,
) -> dict[str, np.ndarray]:
    """Per-step boolean gate arrays, indexable inside `lax.scan`.

    Reference schedule computation (composite.py:39-52): the injection
    timesteps are the first ``int(n_steps * fraction)`` entries of the *full*
    descending timestep list; a step injects iff its t is among them (or
    t == 1000, pnp_utils.py:624).  The sampler may iterate a truncated list
    (`ddim_init_latents_t_idx`, pipeline_i2vgen_xl.py:1554) — gates returned
    here line up element-wise with `run_timesteps`.
    """
    full_timesteps = np.asarray(full_timesteps)
    run_timesteps = np.asarray(run_timesteps)
    out = {}
    for name, frac in (
        ("conv", pnp_f_t),
        ("spatial", pnp_spatial_attn_t),
        ("temporal", pnp_temp_attn_t),
    ):
        sched = {int(t) for t in full_timesteps[: int(n_steps * frac)]}
        out[name] = np.asarray(
            [int(t) in sched or int(t) == 1000 for t in run_timesteps], dtype=bool
        )
    return out


# ---------------------------------------------------------------------------
# Two-pass execution: capture source-branch features, consume on edit branches
# ---------------------------------------------------------------------------
#
# The fused path (above) runs all N+3 branches in one batch.  Two-pass mode
# splits it: pass A runs ONLY the source branches (bg + objects, batch N+1)
# and captures the raw per-branch features at every injection site (flax
# `sow`); pass B runs ONLY the edit branches (uncond + cond, batch 2) and
# composites the captured features into its Q/K/activations.  The math is
# identical to the fused path; the peak activation memory drops from
# batch N+3 to max(N+1, 2), which is what unlocks 720p + encoder reuse on a
# single 16 GB chip.  Site ids are f"{kind}_{block_index}_{layer}" plus
# "out_conv".


def consume_spatial_qk(
    q: jax.Array, k: jax.Array, src_q: jax.Array, src_k: jax.Array,
    pnp: PnPState, h: int, w: int,
    soft: bool = False, gate: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """Edit-branch Q/K injection from captured source features.

    q, k: [2*F, hw, C] (uncond, cond); src_q/src_k: [(N+1)*F, hw, C].
    """
    n = pnp.num_objects
    bf, hw, c = q.shape
    f = bf // 2
    mask = pnp.mask_at(h, w, soft=soft).astype(q.dtype).reshape(n, 1, f, hw, 1)

    def edit(x, src):
        xb = x.reshape(2, f, hw, c)
        sb = src.reshape(n + 1, f, hw, c)
        base = sb[0:1] if pnp.inject_background else xb[1:2]
        inj = _composite(base, sb[1 : n + 1][:, None], mask)
        return jnp.concatenate([inj, inj], axis=0).reshape(bf, hw, c)

    if gate is None:
        gate = pnp.gate_spatial
    return (jnp.where(gate, edit(q, src_q), q),
            jnp.where(gate, edit(k, src_k), k))


def consume_temporal_qk(
    q: jax.Array, k: jax.Array, src_q: jax.Array, src_k: jax.Array,
    pnp: PnPState, h: int, w: int,
) -> tuple[jax.Array, jax.Array]:
    """q, k: [2*hw, F, C]; src: [(N+1)*hw, F, C]."""
    n = pnp.num_objects
    bhw, f, c = q.shape
    hw = bhw // 2
    mask = (pnp.mask_at(h, w, soft=True).astype(q.dtype)
            .transpose(0, 2, 3, 1).reshape(n, 1, hw, f, 1))

    def edit(x, src):
        xb = x.reshape(2, hw, f, c)
        sb = src.reshape(n + 1, hw, f, c)
        base = sb[0:1] if pnp.inject_background else xb[1:2]
        inj = _composite(base, sb[1 : n + 1][:, None], mask)
        return jnp.concatenate([inj, inj], axis=0).reshape(bhw, f, c)

    gate = pnp.gate_temporal
    return (jnp.where(gate, edit(q, src_q), q),
            jnp.where(gate, edit(k, src_k), k))


def consume_conv_features(
    x: jax.Array, src: jax.Array, pnp: PnPState, h: int, w: int
) -> jax.Array:
    """x: [2*F, h, w, C]; src: [(N+1)*F, h, w, C]; base is ALWAYS bg."""
    n = pnp.num_objects
    bf, hh, ww, c = x.shape
    f = bf // 2
    mask = pnp.mask_at(h, w).astype(x.dtype).reshape(n, 1, f, hh, ww, 1)
    sb = src.reshape(n + 1, f, hh, ww, c)
    inj = _composite(sb[0:1], sb[1 : n + 1][:, None], mask)
    edited = jnp.concatenate([inj, inj], axis=0).reshape(bf, hh, ww, c)
    return jnp.where(pnp.gate_conv, edited, x)


def build_capture_weights(
    pyr_binary: Dict[Tuple[int, int], jax.Array],
    pyr_soft: Dict[Tuple[int, int], jax.Array],
    inject_background: bool,
) -> Dict[str, Dict[Tuple[int, int], jax.Array]]:
    """Per-branch capture multipliers for STREAMED capture.

    The pre-composited capture value expands to S = sum_b x_b * M_b over
    source branches b = 0..N (0 = bg):
        M_0 = W = prod_j (1 - m_j)        (qk sites: zero unless
                                           inject_background; conv sites:
                                           always — base is always bg)
        M_j = m_j * prod_{k>j} (1 - m_k)  (later object wins)
    Returns pyramids stacked on a leading branch axis [N+1, F, h, w] keyed
    "qk_binary" / "qk_soft" / "conv" — a `lax.scan` over source branches
    slices off axis 0 and passes the slice as PnPState.capture_weight.
    """
    def stack(pyr, qk: bool):
        out = {}
        for res, m in pyr.items():
            m = jnp.asarray(m)  # [N, F, h, w]
            n = m.shape[0]
            branches = []
            w_all = _transparency(m)
            if qk and not inject_background:
                branches.append(jnp.zeros_like(w_all))
            else:
                branches.append(w_all)
            for j in range(n):
                t = m[j]
                for k in range(j + 1, n):
                    t = t * (1.0 - m[k])
                branches.append(t)
            out[res] = jnp.stack(branches)  # [N+1, F, h, w]
        return out

    return {
        "qk_binary": stack(pyr_binary, qk=True),
        "qk_soft": stack(pyr_soft, qk=True),
        "conv": stack(pyr_binary, qk=False),
    }


def stream_capture_spatial(q, k, pnp: PnPState, h: int, w: int):
    """One source branch's capture term: q, k [F, hw, C] -> (q*M, k*M)."""
    wgt = pnp.capture_weight["qk_binary"][(h, w)].astype(q.dtype)
    f = wgt.shape[0]
    wgt = wgt.reshape(f, h * w, 1)
    return q * wgt, k * wgt


def stream_capture_temporal(q, k, pnp: PnPState, h: int, w: int):
    """Transposed temporal layout: q, k [hw, F, C]."""
    wgt = pnp.capture_weight["qk_soft"][(h, w)].astype(q.dtype)
    f = wgt.shape[0]
    wgt = wgt.reshape(f, h * w).T[:, :, None]  # [hw, F, 1]
    return q * wgt, k * wgt


def stream_capture_temporal_natural(q, k, pnp: PnPState, h: int, w: int):
    """Natural temporal layout: q, k [F, hw, C] (batch-1 flattened)."""
    wgt = pnp.capture_weight["qk_soft"][(h, w)].astype(q.dtype)
    f = wgt.shape[0]
    wgt = wgt.reshape(f, h * w, 1)
    return q * wgt, k * wgt


def stream_capture_conv(x, pnp: PnPState, h: int, w: int):
    """Conv sites: x [F, h, w, C] -> x*M (bg term always included)."""
    wgt = pnp.capture_weight["conv"][(h, w)].astype(x.dtype)
    return x * wgt[..., None]


# ---------------------------------------------------------------------------
# Pre-composited capture: store ONE branch-equivalent per site instead of N+1
# ---------------------------------------------------------------------------
#
# The sequential composite  base <- base*(1-m_j) + obj_j*m_j  expands to
#     inj = base * W + S,   W = prod_j (1-m_j),
#     S = sum_j obj_j * m_j * prod_{k>j} (1-m_k).
# W depends only on the masks (recomputable in the consume pass) and S only
# on the SOURCE branches, so capture can store just S (plus, for
# inject_background=True, fold the bg base into S since bg is a source).
# Feature memory per site drops from (N+1) branch-tensors to 1.
# Equal to the sequential loop up to fp reassociation (~1e-7).


def _source_sum(objs: jax.Array, masks: jax.Array) -> jax.Array:
    """S = sum_j objs[j]*m_j*prod_{k>j}(1-m_k).  objs: [N, ...]; masks
    broadcastable [N, ...]."""
    n = objs.shape[0]
    s = jnp.zeros_like(objs[0])
    for j in range(n):
        term = objs[j] * masks[j]
        for k in range(j + 1, n):
            term = term * (1.0 - masks[k])
        s = s + term
    return s


def _transparency(masks: jax.Array) -> jax.Array:
    w = 1.0 - masks[0]
    for j in range(1, masks.shape[0]):
        w = w * (1.0 - masks[j])
    return w


def precomposite_spatial(
    q: jax.Array, k: jax.Array, pnp: PnPState, h: int, w: int,
    soft: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Capture-side: source q/k [(N+1)*F, hw, C] -> per-site S (folding the
    bg base in when inject_background)."""
    n = pnp.num_objects
    bf, hw, c = q.shape
    f = bf // (n + 1)
    mask = pnp.mask_at(h, w, soft=soft).astype(q.dtype).reshape(n, 1, f, hw, 1)

    def s_of(x):
        xb = x.reshape(n + 1, 1, f, hw, c)
        s = _source_sum(xb[1:], mask)
        if pnp.inject_background:
            s = s + xb[0] * _transparency(mask)
        return s[0]

    return s_of(q), s_of(k)


def precomposite_temporal(
    q: jax.Array, k: jax.Array, pnp: PnPState, h: int, w: int
) -> tuple[jax.Array, jax.Array]:
    """Capture-side for temporal sites: q/k [(N+1)*hw, F, C] -> S."""
    n = pnp.num_objects
    bhw, f, c = q.shape
    hw = bhw // (n + 1)
    mask = (pnp.mask_at(h, w, soft=True).astype(q.dtype)
            .transpose(0, 2, 3, 1).reshape(n, 1, hw, f, 1))

    def s_of(x):
        xb = x.reshape(n + 1, 1, hw, f, c)
        s = _source_sum(xb[1:], mask)
        if pnp.inject_background:
            s = s + xb[0] * _transparency(mask)
        return s[0]

    return s_of(q), s_of(k)


def precomposite_conv(x: jax.Array, pnp: PnPState, h: int, w: int) -> jax.Array:
    """Capture-side for conv sites (base is ALWAYS bg): the full composite."""
    n = pnp.num_objects
    bf, hh, ww, c = x.shape
    f = bf // (n + 1)
    mask = pnp.mask_at(h, w).astype(x.dtype).reshape(n, 1, f, hh, ww, 1)
    xb = x.reshape(n + 1, 1, f, hh, ww, c)
    s = _source_sum(xb[1:], mask) + xb[0] * _transparency(mask)
    return s[0]


def consume_spatial_precomposited(
    q: jax.Array, k: jax.Array, s_q: jax.Array, s_k: jax.Array,
    pnp: PnPState, h: int, w: int,
    soft: bool = False, gate: Optional[jax.Array] = None,
) -> tuple[jax.Array, jax.Array]:
    """q, k: [2*F, hw, C]; s_*: the captured S [F, hw, C]."""
    n = pnp.num_objects
    bf, hw, c = q.shape
    f = bf // 2
    mask = pnp.mask_at(h, w, soft=soft).astype(q.dtype).reshape(n, f, hw, 1)

    def edit(x, s):
        xb = x.reshape(2, f, hw, c)
        if pnp.inject_background:
            inj = s[None]
        else:
            inj = (xb[1:2] * _transparency(mask)[None] + s[None])
        return jnp.concatenate([inj, inj], axis=0).reshape(bf, hw, c)

    if gate is None:
        gate = pnp.gate_spatial
    return (jnp.where(gate, edit(q, s_q), q), jnp.where(gate, edit(k, s_k), k))


def consume_temporal_precomposited(
    q: jax.Array, k: jax.Array, s_q: jax.Array, s_k: jax.Array,
    pnp: PnPState, h: int, w: int,
) -> tuple[jax.Array, jax.Array]:
    n = pnp.num_objects
    bhw, f, c = q.shape
    hw = bhw // 2
    mask = (pnp.mask_at(h, w, soft=True).astype(q.dtype)
            .transpose(0, 2, 3, 1).reshape(n, hw, f, 1))

    def edit(x, s):
        xb = x.reshape(2, hw, f, c)
        if pnp.inject_background:
            inj = s[None]
        else:
            inj = xb[1:2] * _transparency(mask)[None] + s[None]
        return jnp.concatenate([inj, inj], axis=0).reshape(bhw, f, c)

    gate = pnp.gate_temporal
    return (jnp.where(gate, edit(q, s_q), q), jnp.where(gate, edit(k, s_k), k))


def consume_conv_precomposited(
    x: jax.Array, s: jax.Array, pnp: PnPState, h: int, w: int
) -> jax.Array:
    bf, hh, ww, c = x.shape
    inj = jnp.concatenate([s[None], s[None]], axis=0).reshape(bf, hh, ww, c)
    return jnp.where(pnp.gate_conv, inj, x)
