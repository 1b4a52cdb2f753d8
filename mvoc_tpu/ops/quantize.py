"""Int8 weight+activation (w8a8) quantized matmul/conv primitives.

The v5e MXU executes s8 x s8 -> s32 at ~2x the bf16 rate (393.6 vs
196.8 peak TOPS/TFLOPS), and the flagship composite step is ~100%
matmul-class flops (9.4 TF conv + 11.5 TF dot_general per UNet forward at
16f @ 512px — see ROUND_NOTES round 4).  These helpers express the standard
symmetric-int8 recipe in plain jnp so XLA owns the fusion:

  * weights:      per-output-channel symmetric scales, quantized ONCE by
                  `quantize_params` (a pre-pass over the param pytree — the
                  per-step program never re-quantizes loop-invariant
                  weights);
  * activations:  dynamic per-tensor symmetric scale (one max-reduce per
                  site; XLA fuses the quantize into the producer and the
                  dequantize into the consumer epilogue);
  * accumulation: int32 on the MXU via `preferred_element_type`.

This is an APPROXIMATE acceleration mode in the same contract as
capture/encoder reuse (exactness switch off by default, drift quantified by
utils/quality + bench --preset quality).  The torch reference computes
everything in fp16 (/root/reference/i2vgen-xl/inverse.py:113-118); int8 has
no reference counterpart — it exists to push past reference parity on TPU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# int8 symmetric range. We clip to +/-127 (not -128) so the scale maps the
# max-abs value exactly and the quantizer is symmetric around 0.
_QMAX = 127.0


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantizedTensor:
    """An int8 tensor + its per-channel fp32 dequantization scale.

    `data` is int8 with the same shape as the original tensor; `scale` is
    fp32 broadcastable against it (kept with singleton dims so
    `data * scale` dequantizes directly).  Registered as a pytree so it can
    live inside a flax param tree and cross jit boundaries.
    """

    data: jax.Array   # int8
    scale: jax.Array  # fp32, broadcastable to data.shape

    def tree_flatten(self):
        return (self.data, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return self.data.shape

    @property
    def dtype(self):  # the *logical* dtype callers would compute in
        return self.scale.dtype

    def dequantize(self, dtype=jnp.float32) -> jax.Array:
        return (self.data.astype(self.scale.dtype) * self.scale).astype(dtype)


def quantize_tensor(w: jax.Array, channel_axes: Sequence[int]) -> QuantizedTensor:
    """Symmetric per-channel int8 quantization.

    `channel_axes` are the axes KEPT distinct (one scale per index along
    them — e.g. the output-channel axis of a conv kernel); all other axes
    share a scale.  Zero channels get scale 1 to avoid 0/0.
    """
    w = w.astype(jnp.float32)
    reduce_axes = tuple(a for a in range(w.ndim) if a not in tuple(channel_axes))
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.where(amax > 0, amax / _QMAX, 1.0)
    q = jnp.clip(jnp.round(w / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return QuantizedTensor(q, scale)


def _quantize_activation(
    x: jax.Array, reduce_axes: Sequence[int],
) -> tuple[jax.Array, jax.Array]:
    """Dynamic symmetric int8 quantization of an activation.

    `reduce_axes` are the axes SHARING one scale (keepdims) — per-row for
    matmuls (amax over the contraction axis only: per-token scales absorb
    the activation outliers that wreck per-tensor quantization; measured
    4-5x drift reduction on the tiny UNet), per-sample for convs (a conv
    output mixes all spatial positions of one batch sample, so only the
    batch axis may keep distinct scales).  One fused max-abs reduce per
    call — cheap next to the matmul it feeds.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=tuple(reduce_axes),
                   keepdims=True)
    scale = jnp.where(amax > 0, amax / _QMAX, 1.0)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -_QMAX, _QMAX)
    return xq.astype(jnp.int8), scale


def int8_conv(
    x: jax.Array,                 # [..., spatial..., C_in] channels-last
    kernel: QuantizedTensor,      # HWIO (or DHWIO) int8 + per-O scale
    *,
    strides: Sequence[int],
    padding,                      # as lax.conv_general_dilated accepts
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """w8a8 conv: s8 x s8 -> s32 on the MXU, dequantized in the epilogue.

    Activation scale is per batch sample (axis 0): a conv output mixes all
    spatial positions/channels of one sample, so that is the finest valid
    static grouping."""
    xq, x_scale = _quantize_activation(x, reduce_axes=range(1, x.ndim))
    nd = kernel.data.ndim - 2  # spatial rank
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.data.shape,
        ("NHWC", "HWIO", "NHWC") if nd == 2 else ("NDHWC", "DHWIO", "NDHWC"))
    acc = jax.lax.conv_general_dilated(
        xq, kernel.data, window_strides=tuple(strides), padding=padding,
        dimension_numbers=dn, preferred_element_type=jnp.int32)
    # kernel.scale is [1]*nd + [1, O] -> per-output-channel; x_scale is
    # [N, 1, ..., 1] -> per-sample; both broadcast into the epilogue
    o_scale = kernel.scale.reshape(kernel.scale.shape[-1])
    return (acc.astype(jnp.float32) * (x_scale * o_scale)).astype(out_dtype)


def _s8_gemm(
    xq: jax.Array,        # [M, K] int8
    wq: jax.Array,        # [K, N] int8
    x_scale: jax.Array,   # [M] f32 per-row scales
    w_scale: jax.Array,   # [N] f32 per-column scales
    *,
    out_dtype,
) -> jax.Array:
    """One s8 x s8 -> s32 GEMM + fused dequant epilogue, impl-dispatched.

    Default is XLA's int8 dot (the r5 probe measured it at/above the
    hand-tiled kernel on every workload GEMM: ff_1280 1.51x bf16, the
    stacked tconv 5.0x — TPU_RUNS_r05.log s8_gemm_probe_final);
    MVOC_S8_IMPL=pallas routes through ops/s8gemm.py's blocked kernel,
    kept as the parity-pinned reference implementation of the probe."""
    import os

    if os.environ.get("MVOC_S8_IMPL") == "pallas":
        from mvoc_tpu.ops.s8gemm import s8_matmul

        return s8_matmul(xq, wq, x_scale, w_scale, out_dtype=out_dtype)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    deq = acc.astype(jnp.float32) * (x_scale.reshape(-1, 1).astype(jnp.float32)
                                     * w_scale.reshape(1, -1).astype(jnp.float32))
    return deq.astype(out_dtype)


def int8_tconv_stack3(
    x5: jax.Array,                # [B, F, H, W, C]
    kernel: QuantizedTensor,      # [3, 1, 1, C, O] int8 + per-O scale
    *,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """w8a8 (3,1,1) temporal conv in the matmul form (ops/conv.tconv3_stack3).

    XLA's int8 3D conv emitter measured BELOW bf16 on this shape (0.81x,
    scripts/int8_probe.py r4); the stack3 re-expression turns it into one
    MXU-aligned s8 GEMM [M, C] x [C, 3O] + a dequantized frame-shift adder —
    measured 5.0x bf16 through the XLA int8 dot at the deep-tier geometry
    (tconv_1280, TPU_RUNS_r05.log s8_gemm_probe_final).  The int8 kernel
    values are reused unchanged (quantization is per output channel, so the
    per-column scale of stacked column (tap, o) is scale[o]); activations
    get per-ROW scales — finer than int8_conv's per-sample.  Same
    approximation class as int8_conv, not bitwise equal (tap-sum order +
    scale granularity differ)."""
    b, f, h, w, c = x5.shape
    o = kernel.data.shape[-1]
    xq, x_scale = _quantize_activation(x5, reduce_axes=(x5.ndim - 1,))
    m = b * f * h * w
    # [3,1,1,C,O] -> [C, 3*O] columns ordered (tap, o)
    wstack = jnp.transpose(kernel.data[:, 0, 0], (1, 0, 2)).reshape(c, 3 * o)
    col_scale = jnp.broadcast_to(
        kernel.scale.reshape(1, o), (3, o)).reshape(3 * o)
    y = _s8_gemm(xq.reshape(m, c), wstack, x_scale.reshape(m), col_scale,
                 out_dtype=jnp.float32).reshape(b, f, h, w, 3, o)
    yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0), (0, 0)))
    out = yp[:, 0:f, :, :, 0] + y[:, :, :, :, 1] + yp[:, 2:f + 2, :, :, 2]
    return out.astype(out_dtype)


def int8_matmul(
    x: jax.Array,                 # [..., K]
    kernel: QuantizedTensor,      # [K, N] int8 + per-N scale
    *,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """w8a8 dense: s8 x s8 -> s32, dequantized in the epilogue.

    Activation scale is per row (per token): only the contraction axis
    shares a scale, so token outliers don't flatten the whole tensor's
    quantization grid.  MVOC_S8_IMPL=pallas routes the GEMM through the
    hand-tiled Pallas kernel (ops/s8gemm.py — VMEM-resident s32
    accumulator, dequant fused into the store) instead of XLA's int8
    dot; the default is decided by scripts/s8_gemm_probe.py."""
    xq, x_scale = _quantize_activation(x, reduce_axes=(x.ndim - 1,))
    o_scale = kernel.scale.reshape(kernel.scale.shape[-1])
    m = 1
    for d in x.shape[:-1]:
        m *= int(d)
    out = _s8_gemm(xq.reshape(m, x.shape[-1]), kernel.data,
                   x_scale.reshape(m), o_scale, out_dtype=out_dtype)
    return out.reshape(x.shape[:-1] + (kernel.data.shape[-1],))


# ---------------------------------------------------------------------------
# Drop-in flax modules
#
# QuantConv/QuantDense subclass nn.Conv/nn.Dense and dispatch on the TYPE of
# the stored kernel leaf: a plain array delegates to the parent (bitwise the
# stock op — parity tests and the persistent compile cache are unaffected),
# a QuantizedTensor (installed by `quantize_params`) runs the w8a8 path.
# Param names/shapes are the parent's, so models/convert.py needs no
# changes and `quantize: int8` is purely a load-time param transform.


class QuantConv(nn.Conv):
    """nn.Conv with two fast-path dispatches on the bound kernel leaf:

    * `QuantizedTensor` kernel -> w8a8 int8 conv (approximate mode);
    * plain kernel on a hot shape -> probed matmul-form conv
      (ops.conv.maybe_matmul_conv; EXACT — same f32 MXU accumulation,
      only tap-summation order differs from XLA's conv emitter).

    Everything else (init time, 1x1/strided kernels, unprobed tiers)
    delegates to stock nn.Conv.
    """

    def _geometry(self, nd: int):
        from flax.linen.linear import canonicalize_padding

        strides = self.strides or 1
        if isinstance(strides, int):
            strides = (strides,) * nd
        return tuple(strides), canonicalize_padding(self.padding, nd)

    @nn.compact
    def __call__(self, inputs: jax.Array) -> jax.Array:
        kernel = self.get_variable("params", "kernel")
        if kernel is None:  # init: let nn.Conv create the params
            return super().__call__(inputs)

        if isinstance(kernel, QuantizedTensor):
            from mvoc_tpu.ops import conv as conv_forms

            strides, padding = self._geometry(kernel.data.ndim - 2)
            y = None
            m_rows = 1
            for d in inputs.shape[:-1]:
                m_rows *= int(d)
            if (kernel.data.ndim == 5
                    and tuple(kernel.data.shape[:3]) == (3, 1, 1)
                    and not isinstance(padding, str)
                    and tuple(strides) == (1, 1, 1)
                    and tuple(map(tuple, padding)) == ((1, 1), (0, 0), (0, 0))
                    and self.feature_group_count == 1 and self.mask is None
                    and m_rows <= conv_forms._tconv_max_rows()
                    and inputs.shape[1] <= conv_forms.TCONV_STACK3_MAX_FRAMES):
                # the (3,1,1) temporal conv as one s8 stack3 GEMM within the
                # probed M/F envelope: XLA's int8 3D conv emitter measured
                # below bf16 here (0.81x, r4 probe) while the stacked s8 dot
                # measured 5.0x (r5 s8_gemm_probe_final).  The bf16
                # stage-keyed tconv_override is NOT consulted: its +/-1.5%
                # stage effect is noise next to the int8 emitter-vs-dot gap.
                y = int8_tconv_stack3(inputs, kernel,
                                      out_dtype=self.dtype or jnp.float32)
            if y is None:
                y = int8_conv(inputs, kernel, strides=strides, padding=padding,
                              out_dtype=self.dtype or jnp.float32)
        else:
            from mvoc_tpu.ops import conv as conv_forms

            strides, padding = self._geometry(kernel.ndim - 2)
            def _dil(d):  # None / 1 / all-ones sequence = no dilation
                return d is None or d == 1 or (
                    not isinstance(d, int) and all(x == 1 for x in d))

            y = None
            if (not isinstance(padding, str) and self.feature_group_count == 1
                    and self.mask is None
                    and _dil(self.input_dilation) and _dil(self.kernel_dilation)):
                y = conv_forms.maybe_matmul_conv(
                    inputs, kernel, strides=strides,
                    padding=tuple(map(tuple, padding)),
                    out_dtype=self.dtype or jnp.float32)
            if y is None:
                return super().__call__(inputs)
        if self.use_bias:
            bias = self.get_variable("params", "bias")
            y = y + bias.astype(y.dtype)
        return y


class QuantDense(nn.Dense):
    """nn.Dense that runs w8a8 when its kernel was pre-quantized."""

    @nn.compact
    def __call__(self, inputs: jax.Array) -> jax.Array:
        kernel = self.get_variable("params", "kernel")
        if not isinstance(kernel, QuantizedTensor):
            return super().__call__(inputs)
        y = int8_matmul(inputs, kernel, out_dtype=self.dtype or jnp.float32)
        if self.use_bias:
            bias = self.get_variable("params", "bias")
            y = y + bias.astype(y.dtype)
        return y


# ---------------------------------------------------------------------------
# Param-tree pre-pass


def _is_conv_or_dense_kernel(path: tuple, leaf) -> Optional[Sequence[int]]:
    """Channel axes for a quantizable kernel leaf, else None.

    Flax stores conv kernels as [*spatial, I, O] and dense kernels as
    [K, N]; both keep the OUTPUT channel as the last axis.  Only leaves
    literally named 'kernel' qualify (biases/scales/embeddings pass through).
    """
    names = [getattr(p, "key", None) for p in path]
    if not names or names[-1] != "kernel":
        return None
    if leaf.ndim < 2:
        return None
    return (leaf.ndim - 1,)


def default_unet_predicate(names: Sequence[str]) -> bool:
    """Default kernel selection for UNet int8: quantize everything except
    (a) the layers whose precision anchors the eps-prediction — the
    time/fps embedding MLPs (their output biases every block) and the
    final conv_out (directly the model output) — and (b) the boundary
    convs with tiny contractions, conv_in (K = 3*3*4 from the raw latent)
    and the image_latents projections, where quantization noise is
    relatively largest and the flops saved are negligible."""
    skip = ("time_embedding", "fps_embedding", "conv_out", "conv_in",
            "image_latents_proj_in", "image_latents_temporal_encoder")
    return not any(any(s in n for s in skip) for n in names)


def mixed_unet_predicate(names: Sequence[str], leaf) -> bool:
    """Measured-boundary int8 selection: quantize ONLY where w8a8 beat bf16
    in the on-chip probes, keep everything else exact-bf16.

    The r4/r5 probes put the full int8 step at a 1.9x LOSS because the
    flops-dominant thin-K GEMMs lose (ff_320 0.74x — quant/dequant
    epilogues swamp a K=320 GEMM) and spatial int8 convs hover at
    0.8-1.15x.  The measured winners are the deep-tier GEMMs through XLA's
    int8 dot (TPU_RUNS_r05.log s8_gemm_probe_final: ff_1280 1.51x,
    ff_1280_out 1.09x, qkv_1280 1.06x, stacked tconv_1280 5.0x), bounding
    what int8 can buy on v5e at ~+7% of the step.  This predicate ships
    exactly that boundary:

      * dense kernels with contraction K >= 1280 (the 1280-tier FF and
        attention projections; thin-K 320/640 tiers stay bf16);
      * (3,1,1) temporal conv kernels with C_in >= 1280 (run as the s8
        stack3 GEMM from QuantConv);
      * spatial convs and everything in `default_unet_predicate`'s skip
        list stay bf16.
    """
    if not default_unet_predicate(names):
        return False
    if leaf.ndim == 2:                       # dense [K, N]
        return leaf.shape[0] >= 1280
    if leaf.ndim == 5:                       # 3D conv [kf, kh, kw, C, O]
        return (tuple(leaf.shape[:3]) == (3, 1, 1)
                and leaf.shape[3] >= 1280)
    return False


def quantize_params(params, *, predicate=None):
    """Quantize conv/dense kernels in a flax param tree to int8.

    Runs ONCE outside the step function (loop-invariant weights must not be
    re-quantized per step).  `predicate` optionally restricts which kernels
    quantize — either `predicate(path_names) -> bool` or
    `predicate(path_names, leaf) -> bool` (shape-aware selections like
    `mixed_unet_predicate` need the leaf); default quantizes all kernel
    leaves.
    """
    import inspect

    takes_leaf = (predicate is not None
                  and len(inspect.signature(predicate).parameters) >= 2)

    def visit(path, leaf):
        axes = _is_conv_or_dense_kernel(path, leaf)
        if axes is None:
            return leaf
        if predicate is not None:
            names = tuple(str(getattr(p, "key", p)) for p in path)
            ok = predicate(names, leaf) if takes_leaf else predicate(names)
            if not ok:
                return leaf
        return quantize_tensor(leaf, axes)

    return jax.tree_util.tree_map_with_path(visit, params)
