"""Jit/scan-compiled pipeline cores: inversion, sampling, PnP composite.

Each core is a pure function of (params, conditioning pytree, latents,
schedule arrays) that compiles to ONE XLA program with a `lax.scan` over
denoising steps — the TPU-native replacement for the reference's python
step loops (reference: pipeline_i2vgen_xl.py:1940-2000 invert loop,
:1166-1202 sampling loop, :1635-1734 composite loop).  All trajectory data
is device-resident; there is no host/disk traffic inside a scan.

Feature caching (encoder reuse / PAB attention broadcast) is compiled as
STATICALLY PARTITIONED nested scans instead of `lax.cond` inside the step
body: step i is "fresh" iff i % k == 0, which is known at trace time, so
the loop becomes an outer scan over blocks of [1 fresh step + (k-1)
cached steps] (plus a remainder block).  No cond, no dead branch in the
hot loop, the cache lives only within a block, and no zero-cache
initializer is needed.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mvoc_tpu import pnp as pnp_lib
from mvoc_tpu.ops.ddim import DDIM


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class UNetConditioning:
    """Per-branch UNet conditioning, leading axis = branch batch B.

    encoder_hidden_states: [B, 77, D]
    image_latents_first:   [B, F, h, w, C] (temporal-encoder path)
    image_latents:         [B, F, h, w, C] (context tokens; frame 0 = true
                           first-frame latent, frames 1.. = position ramp —
                           see prepare_image_latents)
    image_embeddings:      [B, F, D_img]
    fps:                   [B]
    """

    encoder_hidden_states: jax.Array
    image_latents_first: jax.Array
    image_latents: jax.Array
    image_embeddings: jax.Array
    fps: jax.Array


def prepare_image_latents(first_frame_latents: jax.Array, num_frames: int) -> jax.Array:
    """First-frame VAE latents + per-frame position ramp (reference:
    pipeline_i2vgen_xl.py:860-890): frame 0 is the scaled latent, frame k>0
    is a constant plane k/(F-1).

    first_frame_latents: [h, w, C] (already scaled).  Returns [F, h, w, C].
    """
    h, w, c = first_frame_latents.shape
    ramp = jnp.arange(1, num_frames, dtype=first_frame_latents.dtype) / (num_frames - 1)
    planes = jnp.broadcast_to(ramp[:, None, None, None], (num_frames - 1, h, w, c))
    return jnp.concatenate([first_frame_latents[None], planes], axis=0)


# ---------------------------------------------------------------------------
# Blockwise caching scan (shared by inversion + composite)
# ---------------------------------------------------------------------------


def _blockwise_cached_scan(step_fresh, step_cached, init, xs, n_steps: int, k: int):
    """Run n_steps where step i is "fresh" iff i % k == 0, with the
    fresh/cached split resolved STATICALLY (no lax.cond).

    step_fresh(lat, xs_i)          -> (next_lat, cache, y)
    step_cached(lat, cache, xs_i)  -> (next_lat, y)     (cache read-only)

    xs: pytree with leading axis n_steps.  Returns (final_lat, ys) where ys
    stacks the per-step y outputs (None when the steps yield None).
    """
    nb, r = divmod(n_steps, k)

    def cached_body(carry, x):
        lat, cache = carry
        nxt, y = step_cached(lat, cache, x)
        return (nxt, cache), y

    def run_block(lat, xs_blk, width: int):
        x0 = jax.tree.map(lambda v: v[0], xs_blk)
        nxt, cache, y0 = step_fresh(lat, x0)
        if width == 1:
            ys = None if y0 is None else jax.tree.map(lambda v: v[None], y0)
            return nxt, ys
        (fin, _), ys_rest = jax.lax.scan(
            cached_body, (nxt, cache), jax.tree.map(lambda v: v[1:], xs_blk))
        if y0 is None:
            return fin, None
        ys = jax.tree.map(
            lambda a, b: jnp.concatenate([a[None], b], axis=0), y0, ys_rest)
        return fin, ys

    lat = init
    parts = []
    if nb > 0:
        xs_main = jax.tree.map(
            lambda v: v[: nb * k].reshape((nb, k) + v.shape[1:]), xs)

        def outer(lat, xs_blk):
            return run_block(lat, xs_blk, k)

        lat, ys_main = jax.lax.scan(outer, lat, xs_main)
        if ys_main is not None:
            parts.append(jax.tree.map(
                lambda v: v.reshape((nb * k,) + v.shape[2:]), ys_main))
    if r > 0:
        xs_rem = jax.tree.map(lambda v: v[nb * k:], xs)
        lat, ys_rem = run_block(lat, xs_rem, r)
        if ys_rem is not None:
            parts.append(ys_rem)
    if not parts:
        return lat, None
    if len(parts) == 1:
        return lat, parts[0]
    return lat, jax.tree.map(lambda *vs: jnp.concatenate(vs, axis=0), *parts)


# ---------------------------------------------------------------------------
# Inversion
# ---------------------------------------------------------------------------


def ddim_inversion_core(
    unet_apply: Callable,
    ddim: DDIM,
    unet_params,
    x0_latents: jax.Array,            # [F, h, w, C] scaled clean latents
    cond: UNetConditioning,           # B = 1 (cfg==1) or 2 ([uncond, cond])
    timesteps: jax.Array,             # [S] ascending inversion timesteps
    num_inference_steps: int,
    guidance_scale: float = 1.0,
    encoder_reuse_interval: int = 1,
    deep_reuse: bool = False,
) -> jax.Array:
    """Full DDIM inversion as one scan. Returns the trajectory
    [S, F, h, w, C]: entry i = latents at timesteps[i] (ascending), exactly
    the set the reference saves per-step (pipeline_i2vgen_xl.py:1988-1996).

    encoder_reuse_interval > 1: training-free encoder reuse (see
    pnp_composite_core) — the 500-step inversion dominates end-to-end
    wall-clock, so this is the highest-leverage acceleration knob.
    deep_reuse=True additionally broadcasts the up-block attention outputs
    (PAB), so a cached inversion step computes only up-block convs/FF +
    the DDIM-inverse update.
    """
    do_cfg = guidance_scale > 1.0
    n_branches = 2 if do_cfg else 1

    def one_step(latents, t, cache=None, want_cache: bool = False):
        inp = jnp.broadcast_to(latents[None], (n_branches,) + latents.shape)
        kwargs = dict(
            sample=inp,
            timestep=t,
            fps=cond.fps,
            image_latents_first=cond.image_latents_first,
            image_latents=cond.image_latents,
            image_embeddings=cond.image_embeddings,
            encoder_hidden_states=cond.encoder_hidden_states,
        )
        new_cache = None
        if want_cache and deep_reuse:
            (eps, enc), variables = unet_apply(
                unet_params, **kwargs, return_encoder=True,
                pab_capture=True, mutable=["attn_out"])
            new_cache = (enc, {k: v[0] for k, v in variables["attn_out"].items()})
        elif want_cache:
            eps, new_cache = unet_apply(unet_params, **kwargs, return_encoder=True)
        elif cache is not None and deep_reuse:
            eps = unet_apply(unet_params, **kwargs, cached_encoder=cache[0],
                             pab_cache=cache[1])
        elif cache is not None:
            eps = unet_apply(unet_params, **kwargs, cached_encoder=cache)
        else:
            eps = unet_apply(unet_params, **kwargs)
        if do_cfg:
            eps = eps[0] + guidance_scale * (eps[1] - eps[0])
        else:
            eps = eps[0]
        return ddim.inverse_step(eps, t, latents, num_inference_steps), new_cache

    if encoder_reuse_interval > 1:
        _, traj = _blockwise_cached_scan(
            lambda lat, t: (lambda nxt, c: (nxt, c, nxt))(*one_step(lat, t, want_cache=True)),
            lambda lat, c, t: (lambda nxt, _: (nxt, nxt))(*one_step(lat, t, cache=c)),
            x0_latents, timesteps, timesteps.shape[0], encoder_reuse_interval)
        return traj

    def body(lat, t):
        nxt, _ = one_step(lat, t)
        return nxt, nxt

    _, trajectory = jax.lax.scan(body, x0_latents, timesteps)
    return trajectory


def ddim_inversion_batch_core(
    unet_apply: Callable,
    ddim: DDIM,
    unet_params,
    x0_latents: jax.Array,            # [J, F, h, w, C] — J independent videos
    cond: UNetConditioning,           # leading axis J (one conditioning per video)
    timesteps: jax.Array,             # [S] ascending inversion timesteps
    num_inference_steps: int,
    encoder_reuse_interval: int = 1,
    deep_reuse: bool = False,
) -> jax.Array:
    """Invert J independent videos in ONE scan, J = the UNet batch axis.

    The reference loops source videos serially on one GPU (inverse.py:136);
    here they ride the batch axis — on one chip this batches the MXU work,
    and under a (job, seq, model) mesh the J axis shards over "job" so each
    mesh slice owns one video (pure DP: zero cross-video communication).
    Inversion runs at cfg == 1 (group_inversion/template.yaml:32), so each
    video contributes exactly one UNet branch.  Returns [S, J, F, h, w, C].
    deep_reuse: see ddim_inversion_core.
    """

    def one_step(latents, t, cache=None, want_cache: bool = False):
        kwargs = dict(
            sample=latents,
            timestep=t,
            fps=cond.fps,
            image_latents_first=cond.image_latents_first,
            image_latents=cond.image_latents,
            image_embeddings=cond.image_embeddings,
            encoder_hidden_states=cond.encoder_hidden_states,
        )
        new_cache = None
        if want_cache and deep_reuse:
            (eps, enc), variables = unet_apply(
                unet_params, **kwargs, return_encoder=True,
                pab_capture=True, mutable=["attn_out"])
            new_cache = (enc, {k: v[0] for k, v in variables["attn_out"].items()})
        elif want_cache:
            eps, new_cache = unet_apply(unet_params, **kwargs, return_encoder=True)
        elif cache is not None and deep_reuse:
            eps = unet_apply(unet_params, **kwargs, cached_encoder=cache[0],
                             pab_cache=cache[1])
        elif cache is not None:
            eps = unet_apply(unet_params, **kwargs, cached_encoder=cache)
        else:
            eps = unet_apply(unet_params, **kwargs)
        return ddim.inverse_step(eps, t, latents, num_inference_steps), new_cache

    if encoder_reuse_interval > 1:
        _, traj = _blockwise_cached_scan(
            lambda lat, t: (lambda nxt, c: (nxt, c, nxt))(*one_step(lat, t, want_cache=True)),
            lambda lat, c, t: (lambda nxt, _: (nxt, nxt))(*one_step(lat, t, cache=c)),
            x0_latents, timesteps, timesteps.shape[0], encoder_reuse_interval)
        return traj

    def body(lat, t):
        nxt, _ = one_step(lat, t)
        return nxt, nxt

    _, trajectory = jax.lax.scan(body, x0_latents, timesteps)
    return trajectory


# ---------------------------------------------------------------------------
# Plain sampling (reconstruction / image-to-video)
# ---------------------------------------------------------------------------


def ddim_sampling_core(
    unet_apply: Callable,
    ddim: DDIM,
    unet_params,
    latents: jax.Array,               # [F, h, w, C] noisy start
    cond: UNetConditioning,           # B = 1 or 2 ([uncond, cond])
    timesteps: jax.Array,             # [S'] descending (possibly truncated)
    num_inference_steps: int,
    guidance_scale: float,
    eta: float = 0.0,
    noise: Optional[jax.Array] = None,  # [S', F, h, w, C] for eta > 0
) -> jax.Array:
    """Plain DDIM sampling scan (reference pipe.__call__ loop,
    pipeline_i2vgen_xl.py:1166-1202, truncated start at :1141)."""
    do_cfg = guidance_scale > 1.0
    n_branches = 2 if do_cfg else 1

    def body(lat, xs):
        if eta > 0.0:
            t, step_noise = xs
        else:
            t, step_noise = xs, None
        inp = jnp.broadcast_to(lat[None], (n_branches,) + lat.shape)
        eps = unet_apply(
            unet_params,
            sample=inp,
            timestep=t,
            fps=cond.fps,
            image_latents_first=cond.image_latents_first,
            image_latents=cond.image_latents,
            image_embeddings=cond.image_embeddings,
            encoder_hidden_states=cond.encoder_hidden_states,
        )
        if do_cfg:
            eps = eps[0] + guidance_scale * (eps[1] - eps[0])
        else:
            eps = eps[0]
        nxt = ddim.step(eps, t, lat, num_inference_steps, eta=eta, noise=step_noise)
        return nxt, None

    xs = (timesteps, noise) if eta > 0.0 else timesteps
    final, _ = jax.lax.scan(body, latents, xs)
    return final


# ---------------------------------------------------------------------------
# PnP composite sampling
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CompositeSchedule:
    """Per-step arrays for the composite scan, all length S' (run steps).

    bg_traj:        [S', F, h, w, C] background inverted latents at each run t
    obj_traj:       [S', N, F, h, w, C] object inverted latents at each run t
    obj_fusion_lat: [N, F, h, w, C] the (constant) offset-timestep object
                    latents pasted during fusion.  The reference indexes its
                    per-object fusion timestep list with a counter that is
                    initialized to 0 and never incremented
                    (pipeline_i2vgen_xl.py:1634, 1649), so the SAME latent —
                    full_timesteps[offset_j:][fusion_steps[0]] — is pasted at
                    every fusion step; replicated faithfully.
    gates:          dict(spatial/temporal/conv) -> [S'] bool
    fusion_mask:    [S'] bool — reference: fusion_steps[0] <= i < fusion_steps[1]
                    over RUN step index (pipeline_i2vgen_xl.py:1639)
    timesteps:      [S'] run timesteps (descending, truncated)
    """

    bg_traj: jax.Array
    obj_traj: jax.Array
    obj_fusion_lat: jax.Array
    gate_spatial: jax.Array
    gate_temporal: jax.Array
    gate_conv: jax.Array
    fusion_mask: jax.Array
    timesteps: jax.Array


def pnp_composite_core(
    unet_apply: Callable,
    ddim: DDIM,
    unet_params,
    init_latents: jax.Array,          # [F, h, w, C] random init
    cond: UNetConditioning,           # B = N + 3 branches
    sched: CompositeSchedule,
    masks_soft: jax.Array,            # [N, F, h, w] float (noise fusion + temporal attn)
    masks_binary_pyramid: Dict[Tuple[int, int], jax.Array],
    masks_soft_pyramid: Dict[Tuple[int, int], jax.Array],
    num_inference_steps: int,
    guidance_scale: float,
    random_noise_ratio: float = 0.0,
    obj_random_noise_fusion: bool = False,
    inject_background: bool = True,
    encoder_reuse_interval: int = 1,
    two_pass=False,
    capture_weights=None,
    pab_interval: int = 1,
    capture_reuse_interval: int = 1,
    capture_reuse_deep: bool = False,
) -> jax.Array:
    """The MVOC composite sampler as one scan (reference:
    pipeline_i2vgen_xl.py:1635-1734 + pnp_utils injection sites).

    Branch layout [bg, obj_1..obj_N, uncond, cond]; source branches are fed
    their inverted latents at the current t every step; PnP injection and
    noise fusion are pure gated ops.

    encoder_reuse_interval > 1 enables training-free encoder reuse
    (arXiv 2312.09608): the UNet down+mid features are recomputed only every
    k-th step and reused in between (PnP injection lives in the up blocks,
    so it stays exact w.r.t. the reused features).  Compiled as statically
    partitioned block scans — see _blockwise_cached_scan.

    two_pass=True runs each step as capture(sources, batch N+1) then
    consume(edits, batch 2) — numerically identical to the fused batch
    (tested), with peak activation memory of max(N+1, 2) branches instead
    of N+3.  Composes with encoder reuse: since every encoder op is
    per-batch-element (GroupNorm/attention never mix batch rows), caching
    the source-pass (N+1) and edit-pass (2) encoders separately is exactly
    the fused batch-(N+3) cache split in two.

    two_pass="stream" scans the capture over source branches ONE at a time
    (batch 1): per-branch site terms x_b * M_b sum to the same
    pre-composited S (weights from pnp.build_capture_weights, passed as
    `capture_weights`), so peak activation memory is ONE branch —
    independent of object count.  With reuse the per-branch caches ride the
    capture scan as stacked [N+1, ...] ys.

    pab_interval > 1 enables PAB attention-output broadcast
    (arXiv 2408.12588) on the fused path: up-block attention outputs are
    recomputed every k-th step and broadcast in between (approximate;
    interval 1 = off/exact).

    capture_reuse_interval > 1 broadcasts the captured PnP SOURCE FEATURES
    across steps on the two-pass/stream paths: the capture pass (N+1
    source-branch forwards — the majority of a composite step's compute)
    runs only every k-th step and its pre-composited site features are
    injected unchanged in between, while the edit branches, noise fusion
    and DDIM update stay fresh every step.  The same broadcast principle
    as PAB applied at the PnP-feature level (source features drift slowly
    across adjacent t, like attention outputs).  Approximate; interval 1 =
    off/exact.

    capture_reuse_deep=True broadcasts the slow-moving EDIT-pass state too:
    cached steps reuse the edit branches' encoder cache (down+mid features)
    and their up-block attention outputs (PAB), so a cached step computes
    only the edit up-block convs/FFs + CFG + DDIM.  The strongest
    training-free acceleration mode; composes capture reuse + encoder reuse
    + PAB at one interval in a single blockwise scan.
    """
    n_obj = masks_soft.shape[0]
    mask_b = masks_soft[..., None]  # [N, F, h, w, 1]
    reuse = encoder_reuse_interval > 1
    stream = two_pass == "stream"
    if stream:
        assert capture_weights is not None, "stream capture needs capture_weights"
    pab = pab_interval > 1
    if pab:
        assert not (two_pass or stream or reuse), (
            "pab_interval composes with the fused path only")
    cap_reuse = capture_reuse_interval > 1
    if cap_reuse:
        assert (two_pass or stream) and not reuse and not pab, (
            "capture_reuse_interval composes with two_pass/stream only")
    if capture_reuse_deep:
        assert cap_reuse and stream, (
            "capture_reuse_deep extends capture reuse on the stream path")

    def _slice_cond(c, lo, hi):
        return UNetConditioning(
            encoder_hidden_states=c.encoder_hidden_states[lo:hi],
            image_latents_first=c.image_latents_first[lo:hi],
            image_latents=c.image_latents[lo:hi],
            image_embeddings=c.image_embeddings[lo:hi],
            fps=c.fps[lo:hi],
        )

    def step(latents, xs, cache=None, mode: str = "plain"):
        """One composite denoising step.

        mode (STATIC): "plain" (no caching), "fresh" (compute + return the
        cache), "cached" (consume `cache`).  The cache is the encoder
        cache(s) under reuse, the attn_out dict under pab.
        Returns (next_latents, new_cache_or_None).
        """
        (t, bg_lat, obj_lat, g_sp, g_tmp, g_conv, fuse) = xs

        # --- noise fusion (reference: pipeline_i2vgen_xl.py:1639-1665) ---
        def fused(lat):
            lat = random_noise_ratio * lat + (1.0 - random_noise_ratio) * bg_lat
            for j in range(n_obj):
                m = mask_b[j]
                paste = sched.obj_fusion_lat[j] * m
                if obj_random_noise_fusion:
                    fg = lat * m * random_noise_ratio + (1.0 - random_noise_ratio) * paste
                else:
                    fg = paste
                lat = lat * (1.0 - m) + fg
            return lat

        latents = jnp.where(fuse, fused(latents), latents)

        # During fusion steps the object BRANCH inputs are also the offset
        # fusion latents, not the current-t ones (the reference's fusion
        # branch builds objs_inv_latents_at_t_list from the fusion timestep —
        # pipeline_i2vgen_xl.py:1645-1665 vs :1667-1673).
        obj_in = jnp.where(fuse, sched.obj_fusion_lat, obj_lat)

        # --- branch batch [bg, objs, uncond, cond] (reference :1675-1677) ---
        inp = jnp.concatenate(
            [bg_lat[None], obj_in, latents[None], latents[None]], axis=0
        )

        pnp_state = pnp_lib.PnPState(
            masks=masks_binary_pyramid,
            masks_soft=masks_soft_pyramid,
            gate_spatial=g_sp,
            gate_temporal=g_tmp,
            gate_conv=g_conv,
            inject_background=inject_background,
        )

        if stream:
            src_cond = _slice_cond(cond, 0, n_obj + 1)
            edit_cond = _slice_cond(cond, n_obj + 1, n_obj + 3)
            src_inp = inp[: n_obj + 1]

            def branch_apply(cond_b, inp_b, wgt_b, cache_b=None,
                             want_cache=False):
                pnp_b = dataclasses.replace(pnp_state, capture_weight=wgt_b)
                kw = dict(
                    sample=inp_b[None],
                    timestep=t,
                    fps=cond_b.fps[None],
                    image_latents_first=cond_b.image_latents_first[None],
                    image_latents=cond_b.image_latents[None],
                    image_embeddings=cond_b.image_embeddings[None],
                    encoder_hidden_states=cond_b.encoder_hidden_states[None],
                    pnp=pnp_b,
                    pnp_capture=True,
                    mutable=["pnp_features"],
                )
                if want_cache:
                    (_, enc), variables = unet_apply(
                        unet_params, **kw, return_encoder=True)
                    return {k: v[0] for k, v in variables["pnp_features"].items()}, enc
                if cache_b is not None:
                    _, variables = unet_apply(
                        unet_params, **kw, cached_encoder=cache_b)
                else:
                    _, variables = unet_apply(unet_params, **kw)
                return {k: v[0] for k, v in variables["pnp_features"].items()}

            feats_shapes = jax.eval_shape(
                lambda: branch_apply(
                    jax.tree.map(lambda x: x[0], src_cond), src_inp[0],
                    jax.tree.map(lambda x: x[0], capture_weights)))
            feats0 = jax.tree.map(
                lambda sh: jnp.zeros(sh.shape, sh.dtype), feats_shapes)

            src_caches_out = None
            if mode == "cap_cached":
                # broadcast the cached source features (deep: cache also
                # carries the edit encoder + attention outputs, used below)
                feats = cache[0] if capture_reuse_deep else cache
            elif mode == "fresh":
                def cap_body(feats_acc, xs_b):
                    cond_b, inp_b, wgt_b = xs_b
                    f_b, enc = branch_apply(cond_b, inp_b, wgt_b,
                                            want_cache=True)
                    return jax.tree.map(lambda a, b: a + b, feats_acc, f_b), enc

                feats, src_caches_out = jax.lax.scan(
                    cap_body, feats0, (src_cond, src_inp, capture_weights))
            elif mode == "cached":
                src_caches_in, edit_cache = cache

                def cap_body(feats_acc, xs_b):
                    cond_b, inp_b, wgt_b, cache_b = xs_b
                    f_b = branch_apply(cond_b, inp_b, wgt_b, cache_b=cache_b)
                    return jax.tree.map(lambda a, b: a + b, feats_acc, f_b), None

                feats, _ = jax.lax.scan(
                    cap_body, feats0,
                    (src_cond, src_inp, capture_weights, src_caches_in))
            else:
                def cap_body(feats_acc, xs_b):
                    cond_b, inp_b, wgt_b = xs_b
                    f_b = branch_apply(cond_b, inp_b, wgt_b)
                    return jax.tree.map(lambda a, b: a + b, feats_acc, f_b), None

                feats, _ = jax.lax.scan(
                    cap_body, feats0, (src_cond, src_inp, capture_weights))

            pnp_consume = dataclasses.replace(
                pnp_state, mode="consume_pre", features=feats)
            edit_inp = jnp.concatenate([latents[None], latents[None]], axis=0)
            edit_kwargs = dict(
                sample=edit_inp,
                timestep=t,
                fps=edit_cond.fps,
                image_latents_first=edit_cond.image_latents_first,
                image_latents=edit_cond.image_latents,
                image_embeddings=edit_cond.image_embeddings,
                encoder_hidden_states=edit_cond.encoder_hidden_states,
                pnp=pnp_consume,
            )
            new_cache = None
            if mode == "fresh":
                eps_edit, edit_cache = unet_apply(
                    unet_params, **edit_kwargs, return_encoder=True)
                new_cache = (src_caches_out, edit_cache)
            elif mode == "cached":
                eps_edit = unet_apply(unet_params, **edit_kwargs,
                                      cached_encoder=cache[1])
            elif mode == "cap_fresh" and capture_reuse_deep:
                (eps_edit, edit_enc), variables = unet_apply(
                    unet_params, **edit_kwargs, return_encoder=True,
                    pab_capture=True, mutable=["attn_out"])
                attn = {k: v[0] for k, v in variables["attn_out"].items()}
                new_cache = (feats, edit_enc, attn)
            elif mode == "cap_cached" and capture_reuse_deep:
                eps_edit = unet_apply(unet_params, **edit_kwargs,
                                      cached_encoder=cache[1],
                                      pab_cache=cache[2])
            else:
                eps_edit = unet_apply(unet_params, **edit_kwargs)
                if mode == "cap_fresh":
                    new_cache = feats
            eps_g = eps_edit[0] + guidance_scale * (eps_edit[1] - eps_edit[0])
            return ddim.step(eps_g, t, latents, num_inference_steps), new_cache

        if two_pass:
            src_cond = _slice_cond(cond, 0, n_obj + 1)
            edit_cond = _slice_cond(cond, n_obj + 1, n_obj + 3)
            src_inp = inp[: n_obj + 1]
            # PRE-COMPOSITED capture (pnp passed alongside pnp_capture):
            # each site stores ONE branch-equivalent S with
            # inj = base*W + S — ~(N+1)x less feature memory than raw capture
            src_kwargs = dict(
                sample=src_inp,
                timestep=t,
                fps=src_cond.fps,
                image_latents_first=src_cond.image_latents_first,
                image_latents=src_cond.image_latents,
                image_embeddings=src_cond.image_embeddings,
                encoder_hidden_states=src_cond.encoder_hidden_states,
                pnp=pnp_state,
                pnp_capture=True,
            )
            src_cache_out = None
            if mode == "cap_cached":
                feats = cache  # broadcast the cached source features
            else:
                if mode == "fresh":
                    (_, src_cache_out), variables = unet_apply(
                        unet_params, **src_kwargs, return_encoder=True,
                        mutable=["pnp_features"])
                elif mode == "cached":
                    _, variables = unet_apply(
                        unet_params, **src_kwargs, cached_encoder=cache[0],
                        mutable=["pnp_features"])
                else:
                    _, variables = unet_apply(
                        unet_params, **src_kwargs, mutable=["pnp_features"])
                feats = {k: v[0] for k, v in variables["pnp_features"].items()}

            pnp_consume = dataclasses.replace(
                pnp_state, mode="consume_pre", features=feats)
            edit_inp = jnp.concatenate([latents[None], latents[None]], axis=0)
            edit_kwargs = dict(
                sample=edit_inp,
                timestep=t,
                fps=edit_cond.fps,
                image_latents_first=edit_cond.image_latents_first,
                image_latents=edit_cond.image_latents,
                image_embeddings=edit_cond.image_embeddings,
                encoder_hidden_states=edit_cond.encoder_hidden_states,
                pnp=pnp_consume,
            )
            new_cache = None
            if mode == "fresh":
                eps_edit, edit_cache = unet_apply(
                    unet_params, **edit_kwargs, return_encoder=True)
                new_cache = (src_cache_out, edit_cache)
            elif mode == "cached":
                eps_edit = unet_apply(unet_params, **edit_kwargs,
                                      cached_encoder=cache[1])
            else:
                eps_edit = unet_apply(unet_params, **edit_kwargs)
                if mode == "cap_fresh":
                    new_cache = feats
            eps_neg, eps_pos = eps_edit[0], eps_edit[1]
            eps_g = eps_neg + guidance_scale * (eps_pos - eps_neg)
            return ddim.step(eps_g, t, latents, num_inference_steps), new_cache

        # ---- fused path (all N+3 branches in one batch) -----------------
        kwargs = dict(
            sample=inp,
            timestep=t,
            fps=cond.fps,
            image_latents_first=cond.image_latents_first,
            image_latents=cond.image_latents,
            image_embeddings=cond.image_embeddings,
            encoder_hidden_states=cond.encoder_hidden_states,
            pnp=pnp_state,
        )
        new_cache = None
        if mode == "fresh" and reuse:
            eps, new_cache = unet_apply(unet_params, **kwargs, return_encoder=True)
        elif mode == "cached" and reuse:
            eps = unet_apply(unet_params, **kwargs, cached_encoder=cache)
        elif mode == "fresh" and pab:
            eps, variables = unet_apply(
                unet_params, **kwargs, pab_capture=True, mutable=["attn_out"])
            new_cache = {k: v[0] for k, v in variables["attn_out"].items()}
        elif mode == "cached" and pab:
            eps = unet_apply(unet_params, **kwargs, pab_cache=cache)
        else:
            eps = unet_apply(unet_params, **kwargs)

        # CFG over the last two chunks (reference :1713-1717)
        eps_neg, eps_pos = eps[n_obj + 1], eps[n_obj + 2]
        eps_g = eps_neg + guidance_scale * (eps_pos - eps_neg)
        return ddim.step(eps_g, t, latents, num_inference_steps), new_cache

    xs = (
        sched.timesteps,
        sched.bg_traj,
        sched.obj_traj,
        sched.gate_spatial,
        sched.gate_temporal,
        sched.gate_conv,
        sched.fusion_mask,
    )
    n_run = sched.timesteps.shape[0]
    if reuse or pab:
        k = encoder_reuse_interval if reuse else pab_interval
        final, _ = _blockwise_cached_scan(
            lambda lat, x: (lambda nxt, c: (nxt, c, None))(*step(lat, x, mode="fresh")),
            lambda lat, c, x: (step(lat, x, cache=c, mode="cached")[0], None),
            init_latents, xs, n_run, k)
        return final
    if cap_reuse:
        final, _ = _blockwise_cached_scan(
            lambda lat, x: (lambda nxt, c: (nxt, c, None))(*step(lat, x, mode="cap_fresh")),
            lambda lat, c, x: (step(lat, x, cache=c, mode="cap_cached")[0], None),
            init_latents, xs, n_run, capture_reuse_interval)
        return final

    def body(lat, x):
        nxt, _ = step(lat, x)
        return nxt, None

    final, _ = jax.lax.scan(body, init_latents, xs)
    return final


def pnp_composite_batch_core(
    unet_apply: Callable,
    ddim: DDIM,
    unet_params,
    init_latents: jax.Array,          # [J, F, h, w, C] — J independent jobs
    cond: UNetConditioning,           # leading axis J (then N+3 branches)
    sched: CompositeSchedule,         # every field with leading axis J
    masks_soft: jax.Array,            # [J, N, F, h, w]
    masks_binary_pyramid,             # dict[(h, w)] -> [J, N, F, h', w']
    masks_soft_pyramid,
    capture_weights=None,             # leading axis J on every leaf (stream)
    **kwargs,
) -> jax.Array:
    """J independent composites as ONE vmapped program (the stage-2 analogue
    of ddim_inversion_batch_core).

    The reference runs group-config entries through a serial Python loop
    (reference: composite.py:87); here entries with matching signatures ride
    a leading J axis — vmap lifts the whole composite scan, so one chip
    batches the MXU work across entries and under a (job, seq, model) mesh
    the J axis shards over "job" (pure DP: zero cross-entry communication).
    All static knobs (steps, guidance, two_pass, reuse intervals) are shared
    — that's the batching contract the CLI groups by.  Returns
    [J, F, h, w, C]."""
    if capture_weights is not None:
        def one(lat, c, s, ms, pb, ps, cw):
            return pnp_composite_core(
                unet_apply, ddim, unet_params, lat, c, s, ms, pb, ps,
                capture_weights=cw, **kwargs)

        return jax.vmap(one)(init_latents, cond, sched, masks_soft,
                             masks_binary_pyramid, masks_soft_pyramid,
                             capture_weights)

    def one(lat, c, s, ms, pb, ps):
        return pnp_composite_core(
            unet_apply, ddim, unet_params, lat, c, s, ms, pb, ps, **kwargs)

    return jax.vmap(one)(init_latents, cond, sched, masks_soft,
                         masks_binary_pyramid, masks_soft_pyramid)
