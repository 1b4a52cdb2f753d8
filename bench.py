"""Benchmark: MVOC composite denoise steps/sec/chip on real TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Primary metric (BASELINE.json): UNet denoise steps/sec/chip at 16 frames @
512px (latent 64x64), MVOC composite configuration — 5-branch batch
[bg, obj1, obj2, uncond, cond], all PnP injection sites armed, CFG combine +
DDIM step included (i.e. one full iteration of the composite loop,
reference: pipeline_i2vgen_xl.py:1635-1734).

vs_baseline: the reference publishes NO numbers (BASELINE.md), so the
baseline constant below is an ESTIMATE — every record carrying it also
carries "vs_baseline_basis" naming it one.  Derivation (docs/VS_BASELINE.md
has the full arithmetic): the composite step runs the same 5
branch-forwards in both frameworks (reference batch-5 cat,
pipeline_i2vgen_xl.py:1675-1677), so the reference's fp16 flops/step at
16f@512px equals our jaxpr-walked 105.65 TF/step; against A100-80GB fp16
dense peak (312 TF/s) at the 10-25% MFU band realistic for an eager
diffusers video UNet (tiny temporal-attention GEMMs, unfused elementwise,
python injection hooks, per-step disk loads) that brackets the reference
at 0.30-0.74 steps/s.  0.55 is the ~19% MFU midpoint.  The honest
cross-check is the end-to-end <60 s north star tracked separately.

Presets:
  --preset smoke   tiny config, 2 steps  (CI / CPU)
  --preset full    flagship config, 16f @ 512px (default; real TPU)
"""

from __future__ import annotations

import argparse
import os
import json
import sys
import time

import numpy as np

# Estimated reference rate, fp16 A100 batch-5 @16f/512px: 105.65 TF/step
# (same 5 branch-forwards as our stream step) / (312 TF/s x ~19% MFU).
# Bounded range 0.30-0.74 at 10-25% MFU — derivation in docs/VS_BASELINE.md.
REFERENCE_STEPS_PER_SEC_ESTIMATE = 0.55


def probe_backend(attempts: int = 3, probe_timeout: int = 90,
                  retry_sleep: int = 75):
    """Bounded TPU-backend liveness probe.

    The axon TPU tunnel goes down for hours at a time, and when it does even
    ``jax.devices()`` HANGS (it does not raise) — so the probe must run in a
    subprocess with a hard timeout; an in-process try/except can never fire.
    Returns (ok, details).  ``ok`` means a non-CPU backend answered within
    the timeout on some attempt.
    """
    import subprocess

    code = ("import jax; d = jax.devices(); "
            "print(d[0].platform, d[0].device_kind, len(d))")
    log = []
    for i in range(attempts):
        t0 = time.perf_counter()
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=probe_timeout)
            dt = time.perf_counter() - t0
            out = (r.stdout or "").strip()
            if r.returncode == 0 and out and not out.startswith("cpu"):
                log.append({"attempt": i + 1, "ok": True, "device": out,
                            "seconds": round(dt, 1)})
                return True, log
            log.append({"attempt": i + 1, "ok": False,
                        "rc": r.returncode, "out": out[-200:],
                        "err": (r.stderr or "").strip()[-300:],
                        "seconds": round(dt, 1)})
        except subprocess.TimeoutExpired:
            log.append({"attempt": i + 1, "ok": False,
                        "timeout_s": probe_timeout})
        if i + 1 < attempts:
            time.sleep(retry_sleep)
    return False, log


def emit_unavailable(metric: str, probe_log) -> None:
    """Structured failure record: the driver's BENCH artifact must parse even
    through a backend outage (round-2 lesson: BENCH_r02.json was a raw
    traceback, rc=1 — see VERDICT.md Weak #1).  Exit code stays 0; the
    ``error`` field is the signal."""
    print(json.dumps({
        "metric": metric,
        "value": None,
        "unit": "steps/s",
        "vs_baseline": None,
        "error": "tpu_unavailable",
        "probe": probe_log,
        "note": "axon TPU backend did not answer a bounded probe; "
                "see TPU_RUNS_r03.log / scripts/tpu_queue.sh for the "
                "auto-queued measurement runner",
    }))


def peak_tflops_per_sec():
    """bf16 peak of the current device (None when unknown, e.g. CPU)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = [("v5 lite", 197e12), ("v5e", 197e12), ("v5p", 459e12),
             ("v6 lite", 918e12), ("v6e", 918e12), ("v4", 275e12)]
    for k, v in table:
        if k in kind:
            return v
    return None


def mfu_fields(compiled_costs, steps_per_sec):
    """MFU block for the bench JSON: compiled_costs is a list of
    (flops_per_call, weight) with weights summing to 1 over one average
    step; flops come from XLA's compiled cost analysis."""
    flops_step = sum(f * w for f, w in compiled_costs)
    achieved = flops_step * steps_per_sec
    peak = peak_tflops_per_sec()
    out = {
        "model_tflops_per_step": round(flops_step / 1e12, 3),
        "achieved_tflops_per_sec": round(achieved / 1e12, 2),
    }
    if peak:
        out["mfu"] = round(achieved / peak, 4)
    return out


def step_floor(costs) -> float:
    """Speed-of-light seconds per average step for a (flops, weight) mix —
    the physical lower bound timed_loop uses to reject collapsed timings."""
    peak = peak_tflops_per_sec()
    if not peak:
        return 0.0
    return sum(f * w for f, w in costs) / peak


METRIC_SUFFIX = ""  # set to "_int8" by --int8 (appended to every metric)


def emit(rec, anomaly) -> None:
    """Print the bench record, refusing physically impossible ones.

    MFU > 1 means the runtime did not actually execute the measured program
    (the axon dedup/async failure mode — TPU_RUNS_r04.log ab_frame_sblk128
    recorded 564 steps/s / MFU 178 before this guard); such records become
    a structured {"error": "invalid_timing"} instead of a bogus number."""
    if METRIC_SUFFIX and "metric" in rec:
        rec["metric"] = rec["metric"] + METRIC_SUFFIX
    if rec.get("vs_baseline") is not None:
        # the reference publishes no numbers; the denominator is a derived
        # estimate (module docstring + docs/VS_BASELINE.md) — say so in-band
        rec["vs_baseline_basis"] = "estimate: ref A100 fp16 @ ~19% MFU (docs/VS_BASELINE.md)"
    if anomaly:
        rec["async_anomaly"] = anomaly  # True, or "invalid"
    if anomaly == "invalid" or rec.get("mfu", 0.0) > 1.0:
        rec = {"metric": rec.get("metric"), "value": None,
               "unit": rec.get("unit"), "vs_baseline": None,
               "error": "invalid_timing", "detail": rec}
    print(json.dumps(rec))


def timed_loop(iters, body, probe, t_ref, trace_dir=None, t_floor=0.0):
    """Time `iters` calls of body(i) chained (async dispatch, one final
    block on probe()), then sanity-check against `t_ref` — the EXPECTED
    average wall time of one step, measured with blocking (for mixed
    fresh/cached loops the caller passes the (t_fresh + (k-1)*t_cached)/k
    mix, not the cached-only time, so the /3 margin really is a margin).
    One axon run returned a 10-step chained loop in 12 ms (807 steps/s,
    MFU 255 — TPU_RUNS_r03.log natblk2_default): block_until_ready on the
    chained outputs came back instantly.  If the chained per-step time is
    impossibly fast (< t_ref / 3; the margin absorbs the ~26 ms per-call
    dispatch latency that inflates t_ref), re-time with per-step blocking
    and report that instead.  Chained timing stays the default because
    per-step blocking costs ~26 ms/step (up to ~4.5% on the fastest
    presets) and every recorded number this round is chained.

    If `trace_dir` is given, a jax.profiler trace is written around ONLY
    the loop whose dt is returned (on an anomaly re-time the fresh trace
    goes to trace_dir/retime so the bogus chained loop is not counted)
    and the device-op breakdown is printed to stderr.

    `t_floor` is the per-step speed-of-light bound (program flops / chip
    peak).  The ab_frame_sblk128 run (TPU_RUNS_r04.log) showed t_ref itself
    can collapse — the single blocked reference step ALSO returned
    instantly, so the /3 guard had nothing to stand on and a 564 steps/s,
    MFU-178 record got emitted.  A physical floor can't collapse: t_ref is
    clamped to it, and if even the blocked re-time beats the floor the
    anomaly flag comes back as "invalid" for the caller to refuse the
    record.

    Returns (dt, async_anomaly) — async_anomaly is False, True, or
    "invalid"."""
    import time as _time

    import jax

    from mvoc_tpu.utils import profiling as _prof

    t_ref = max(t_ref, t_floor)

    def _run(blocked, tdir):
        t0 = _time.perf_counter()
        with _prof.trace(tdir):
            for i in range(iters):
                body(i)
                if blocked:
                    jax.block_until_ready(probe())
            if not blocked:
                jax.block_until_ready(probe())
            dt = _time.perf_counter() - t0
        if tdir:
            print(json.dumps(_prof.device_op_breakdown(tdir), indent=2),
                  file=sys.stderr)
        return dt

    dt = _run(blocked=False, tdir=trace_dir)
    if t_ref <= 0 or dt >= iters * t_ref / 3:
        return dt, False
    print(f"WARNING: chained loop impossibly fast ({dt:.3f}s for {iters} "
          f"steps vs {t_ref:.3f}s expected/step) — re-timing with per-step "
          "blocking", file=sys.stderr)
    retrace = os.path.join(trace_dir, "retime") if trace_dir else None
    dt = _run(blocked=True, tdir=retrace)
    if t_floor > 0 and dt < iters * t_floor / 3:
        print(f"WARNING: even the BLOCKED re-time ({dt:.3f}s for {iters} "
              f"steps) beats the physical floor {t_floor:.3f}s/step — the "
              "runtime is not executing this program; record is invalid",
              file=sys.stderr)
        return dt, "invalid"
    return dt, True


def cost_flops(jitted, *args, **kwargs):
    """Matmul-class FLOPs of one call of a jitted function.

    Counts by walking the jaxpr (utils/flops.jaxpr_matmul_flops): scan
    bodies multiply by trip count and pallas kernel bodies by grid size.
    XLA's own cost_analysis counts scan bodies ONCE — the stream capture
    scan runs n_obj+1 forwards per step but contributed one body, so every
    pre-round-4 MFU was ~40% low (ROUND_NOTES r4).  Falls back to the XLA
    number if the walk fails.  Operates on ShapeDtypeStructs so donated
    (deleted) arrays are fine as args."""
    import jax

    try:
        from mvoc_tpu.utils.flops import jaxpr_matmul_flops

        return float(jaxpr_matmul_flops(jitted, *args, **kwargs))
    except Exception:
        pass
    try:
        spec = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "shape") else x, (args, kwargs))
        args, kwargs = spec
        cost = jitted.lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def build(preset: str, natural: bool = False, reuse_depth=None):
    import jax

    # persistent compilation cache: repeated bench runs skip the ~15 min
    # full-UNet compile (TPU executables cache reliably; the CPU AOT
    # feature-mismatch issue does not apply here)
    jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.mvoc_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp

    from mvoc_tpu import pnp as pnp_lib
    from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet, UNetConfig
    from mvoc_tpu.ops.ddim import DDIM, SchedulerConfig

    ff_env = os.environ.get("MVOC_FF_CHUNK")
    ff_kw = {"ff_chunk_rows": int(ff_env)} if ff_env is not None else {}
    if preset == "full":
        cfg = UNetConfig(temporal_natural_layout=natural, **ff_kw)
        F, H, W = 16, 64, 64  # 512px @ /8
        dtype = jnp.bfloat16
    elif preset == "full720":
        # the reference's working resolution: 1280x720 -> 90x160 latents
        # (demo configs, reference: group_inversion/group_config.json:7-11)
        cfg = UNetConfig(temporal_natural_layout=natural)
        F, H, W = 16, 90, 160
        dtype = jnp.bfloat16
    elif preset == "long64":
        # the 64-frame long-video configuration (BASELINE configs[3]):
        # windowed temporal attention keeps the frame axis O(F*window)
        cfg = UNetConfig(temporal_natural_layout=natural, temporal_window=16)
        F, H, W = 64, 64, 64
        dtype = jnp.bfloat16
    else:
        cfg = UNetConfig.tiny()
        if natural:
            import dataclasses as _dc
            cfg = _dc.replace(cfg, temporal_natural_layout=True)
        F, H, W = 4, 8, 8
        dtype = jnp.float32

    n_obj, B = 2, 5
    model = I2VGenXLUNet(cfg, dtype=dtype)
    if reuse_depth:
        # partial-depth encoder reuse: bind the depth on every apply
        # (inert unless cached_encoder/return_encoder are used)
        import types

        _m = model
        model = types.SimpleNamespace(
            init=_m.init,
            apply=lambda *a, **k: _m.apply(
                *a, **k, encoder_reuse_depth=int(reuse_depth)))
    rng = np.random.default_rng(0)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape), dtype=dtype)

    inputs = dict(
        sample=mk(B, F, H, W, 4),
        timestep=jnp.asarray([981] * B),
        fps=jnp.asarray([8] * B),
        image_latents_first=mk(B, F, H, W, 4),
        image_latents=mk(B, F, H, W, 4),
        image_embeddings=mk(B, F, cfg.cross_attention_dim),
        encoder_hidden_states=mk(B, 77, cfg.cross_attention_dim),
    )
    params = jax.jit(lambda: model.init(jax.random.key(0), **inputs))()
    if dtype == jnp.bfloat16:
        # match the checkpoint path: params live in bf16 (flax init gives
        # fp32 — 5.3 GB of the 1.4B-param UNet; compute casts to bf16
        # regardless, so this only changes storage)
        params = jax.jit(lambda p: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if x.dtype == jnp.float32 else x, p))(params)

    masks = np.zeros((n_obj, F, H, W), np.float32)
    masks[0, :, : H // 2] = 1.0
    masks[1, :, :, : W // 2] = 1.0
    res = [(H, W), ((H + 1) // 2, (W + 1) // 2), ((H + 3) // 4, (W + 3) // 4)]
    pyr = {k: jnp.asarray(v) for k, v in pnp_lib.build_mask_pyramid(masks, res).items()}
    ddim = DDIM(SchedulerConfig())

    def make_two_pass_step(cached: bool = False, want_cache: bool = False):
        import dataclasses as dc

        def step(params, sample, latents, gate, caches=None):
            pnp_state = pnp_lib.PnPState(
                masks=pyr, masks_soft=pyr,
                gate_spatial=gate, gate_temporal=gate, gate_conv=gate,
            )
            # exclude "sample" (always overridden by the carried arg):
            # tracing a slice of the closed-over inputs["sample"] would bake
            # the same buffer the caller donates -> "Array has been deleted"
            src = {k: (v[: n_obj + 1] if hasattr(v, "shape") and v.shape[:1] == (B,) else v)
                   for k, v in inputs.items() if k != "sample"}
            edit = {k: (v[n_obj + 1:] if hasattr(v, "shape") and v.shape[:1] == (B,) else v)
                    for k, v in inputs.items() if k != "sample"}
            src_kw = dict(pnp=pnp_state, pnp_capture=True, mutable=["pnp_features"])
            if cached:
                src_cache, edit_cache = caches
                _, variables = model.apply(
                    params, **{**src, "sample": sample[: n_obj + 1]},
                    cached_encoder=src_cache, **src_kw)
            elif want_cache:
                (_, src_cache), variables = model.apply(
                    params, **{**src, "sample": sample[: n_obj + 1]},
                    return_encoder=True, **src_kw)
            else:
                # no caches returned: keeps output size (and live HBM) minimal
                _, variables = model.apply(
                    params, **{**src, "sample": sample[: n_obj + 1]}, **src_kw)
            feats = {k: v[0] for k, v in variables["pnp_features"].items()}
            pnp_c = dc.replace(pnp_state, mode="consume_pre", features=feats)
            lat_b = latents[None].astype(dtype)
            edit_sample = jnp.concatenate([lat_b, lat_b], 0)
            if cached:
                eps = model.apply(
                    params, **{**edit, "sample": edit_sample},
                    pnp=pnp_c, cached_encoder=edit_cache)
            elif want_cache:
                eps, edit_cache = model.apply(
                    params, **{**edit, "sample": edit_sample},
                    pnp=pnp_c, return_encoder=True)
            else:
                eps = model.apply(
                    params, **{**edit, "sample": edit_sample}, pnp=pnp_c)
            eps_g = eps[0] + 9.0 * (eps[1] - eps[0])
            new_latents = ddim.step(eps_g, inputs["timestep"][0], latents, 50)
            new_sample = jnp.concatenate(
                [sample[: n_obj + 1], new_latents[None].astype(dtype),
                 new_latents[None].astype(dtype)], axis=0)
            if not (cached or want_cache):
                return new_sample, new_latents
            return new_sample, new_latents, (src_cache, edit_cache)
        if cached:
            # donate the sample/cache buffers: the loop rebinds them every
            # call, so in-place reuse halves live HBM (the PAB cache alone
            # is ~4 GB at 512px batch-5)
            return jax.jit(step, donate_argnums=(1, 4))
        return jax.jit(lambda params, sample, latents, gate: step(
            params, sample, latents, gate), donate_argnums=(1,))

    def make_stream_step(cached: bool = False, want_cache: bool = False,
                         cap_fresh: bool = False, cap_cached: bool = False,
                         deep: bool = False):
        """two_pass='stream': scan capture over source branches (batch 1) —
        peak activation memory of ONE branch; consume on the 2 edit
        branches (see pipeline/core.py stream path).  cached/want_cache add
        encoder reuse with per-branch batch-1 caches.  cap_fresh/cap_cached
        measure capture reuse: the capture pass runs only on fresh steps
        and its features broadcast in between (core capture_reuse_interval)."""
        import dataclasses as dc

        cw = pnp_lib.build_capture_weights(pyr, pyr, inject_background=True)

        def step(params, sample, latents, gate, caches=None):
            pnp_state = pnp_lib.PnPState(
                masks=pyr, masks_soft=pyr,
                gate_spatial=gate, gate_temporal=gate, gate_conv=gate,
            )
            # exclude "sample" (always overridden by the carried arg):
            # tracing a slice of the closed-over inputs["sample"] would bake
            # the same buffer the caller donates -> "Array has been deleted"
            src = {k: (v[: n_obj + 1] if hasattr(v, "shape") and v.shape[:1] == (B,) else v)
                   for k, v in inputs.items() if k != "sample"}
            edit = {k: (v[n_obj + 1:] if hasattr(v, "shape") and v.shape[:1] == (B,) else v)
                    for k, v in inputs.items() if k != "sample"}

            def branch_apply(inp_b, cond_b, wgt_b, cache_b=None, ret=False):
                pnp_b = dc.replace(pnp_state, capture_weight=wgt_b)
                kw = dict(
                    sample=inp_b[None],
                    timestep=inputs["timestep"][:1], fps=inputs["fps"][:1],
                    image_latents_first=cond_b["image_latents_first"][None],
                    image_latents=cond_b["image_latents"][None],
                    image_embeddings=cond_b["image_embeddings"][None],
                    encoder_hidden_states=cond_b["encoder_hidden_states"][None],
                    pnp=pnp_b, pnp_capture=True, mutable=["pnp_features"])
                if ret:
                    (_, enc), variables = model.apply(
                        params, **kw, return_encoder=True)
                    return ({k: v[0] for k, v in variables["pnp_features"].items()},
                            enc)
                if cache_b is not None:
                    _, variables = model.apply(params, **kw, cached_encoder=cache_b)
                else:
                    _, variables = model.apply(params, **kw)
                return {k: v[0] for k, v in variables["pnp_features"].items()}

            cond_fields = ["image_latents_first", "image_latents",
                           "image_embeddings", "encoder_hidden_states"]
            cond_stack = {k: src[k] for k in cond_fields}
            feats_shapes = jax.eval_shape(
                lambda: branch_apply(
                    sample[0], {k: v[0] for k, v in cond_stack.items()},
                    jax.tree.map(lambda x: x[0], cw)))
            feats0 = jax.tree.map(
                lambda sh: jnp.zeros(sh.shape, sh.dtype), feats_shapes)

            if cap_cached:
                # broadcast the cached source features (deep: cache also
                # carries the edit encoder + attention outputs)
                feats = caches[0] if deep else caches
            elif cached or want_cache:
                src_caches, edit_cache = caches if cached else (None, None)

                if cached:
                    def cap_body(acc, xs_b):
                        inp_b, cond_b, wgt_b, cache_b = xs_b
                        f_b = branch_apply(inp_b, cond_b, wgt_b, cache_b=cache_b)
                        return (jax.tree.map(lambda a, b: a + b, acc, f_b),
                                cache_b)
                    feats, src_caches = jax.lax.scan(
                        cap_body, feats0,
                        (sample[: n_obj + 1], cond_stack, cw, src_caches))
                else:
                    def cap_body(acc, xs_b):
                        inp_b, cond_b, wgt_b = xs_b
                        f_b, enc = branch_apply(inp_b, cond_b, wgt_b, ret=True)
                        return (jax.tree.map(lambda a, b: a + b, acc, f_b),
                                enc)
                    feats, src_caches = jax.lax.scan(
                        cap_body, feats0, (sample[: n_obj + 1], cond_stack, cw))
            else:
                def cap_body(acc, xs_b):
                    inp_b, cond_b, wgt_b = xs_b
                    f_b = branch_apply(inp_b, cond_b, wgt_b)
                    return jax.tree.map(lambda a, b: a + b, acc, f_b), None

                feats, _ = jax.lax.scan(
                    cap_body, feats0, (sample[: n_obj + 1], cond_stack, cw))

            pnp_c = dc.replace(pnp_state, mode="consume_pre", features=feats)
            lat_b = latents[None].astype(dtype)
            edit_sample = jnp.concatenate([lat_b, lat_b], 0)
            new_deep_cache = None
            if cached:
                eps = model.apply(
                    params, **{**edit, "sample": edit_sample},
                    pnp=pnp_c, cached_encoder=edit_cache)
            elif want_cache:
                eps, edit_cache = model.apply(
                    params, **{**edit, "sample": edit_sample},
                    pnp=pnp_c, return_encoder=True)
            elif cap_fresh and deep:
                (eps, edit_enc), variables = model.apply(
                    params, **{**edit, "sample": edit_sample},
                    pnp=pnp_c, return_encoder=True, pab_capture=True,
                    mutable=["attn_out"])
                attn = {k: v[0] for k, v in variables["attn_out"].items()}
                new_deep_cache = (feats, edit_enc, attn)
            elif cap_cached and deep:
                eps = model.apply(
                    params, **{**edit, "sample": edit_sample},
                    pnp=pnp_c, cached_encoder=caches[1], pab_cache=caches[2])
            else:
                eps = model.apply(
                    params, **{**edit, "sample": edit_sample}, pnp=pnp_c)
            eps_g = eps[0] + 9.0 * (eps[1] - eps[0])
            new_latents = ddim.step(eps_g, inputs["timestep"][0], latents, 50)
            new_sample = jnp.concatenate(
                [sample[: n_obj + 1], new_latents[None].astype(dtype),
                 new_latents[None].astype(dtype)], axis=0)
            if cap_fresh:
                return new_sample, new_latents, (
                    new_deep_cache if deep else feats)
            if not (cached or want_cache or cap_cached):
                return new_sample, new_latents
            if cap_cached:
                return new_sample, new_latents
            return new_sample, new_latents, (src_caches, edit_cache)
        if cap_cached:
            # feats cache is read every cached step — NOT donated
            return jax.jit(step, donate_argnums=(1,))
        if cap_fresh:
            return jax.jit(lambda params, sample, latents, gate: step(
                params, sample, latents, gate), donate_argnums=(1,))
        if cached:
            # donate the sample/cache buffers: the loop rebinds them every
            # call, so in-place reuse halves live HBM (the PAB cache alone
            # is ~4 GB at 512px batch-5)
            return jax.jit(step, donate_argnums=(1, 4))
        return jax.jit(lambda params, sample, latents, gate: step(
            params, sample, latents, gate), donate_argnums=(1,))

    def make_pab_step(cached: bool = False):
        """PAB attention-output broadcast on the fused path: fresh steps
        capture the up-block attention outputs ("attn_out" collection),
        cached steps skip qkv+sdpa+out-proj at every up-block attention and
        broadcast the captured outputs (approximate; see unet pab_cache)."""
        def step(params, sample, latents, gate, cache=None):
            pnp_state = pnp_lib.PnPState(
                masks=pyr, masks_soft=pyr,
                gate_spatial=gate, gate_temporal=gate, gate_conv=gate,
            )
            kw = {**inputs, "sample": sample}
            if cached:
                eps = model.apply(params, **kw, pnp=pnp_state, pab_cache=cache)
                new_cache = cache
            else:
                eps, variables = model.apply(
                    params, **kw, pnp=pnp_state, pab_capture=True,
                    mutable=["attn_out"])
                new_cache = {k: v[0] for k, v in variables["attn_out"].items()}
            eps_g = eps[3] + 9.0 * (eps[4] - eps[3])
            new_latents = ddim.step(eps_g, inputs["timestep"][0], latents, 50)
            new_sample = jnp.concatenate(
                [sample[: n_obj + 1], new_latents[None].astype(dtype),
                 new_latents[None].astype(dtype)], axis=0)
            return new_sample, new_latents, new_cache
        if cached:
            # donate the sample/cache buffers: the loop rebinds them every
            # call, so in-place reuse halves live HBM (the PAB cache alone
            # is ~4 GB at 512px batch-5)
            return jax.jit(step, donate_argnums=(1, 4))
        return jax.jit(lambda params, sample, latents, gate: step(
            params, sample, latents, gate), donate_argnums=(1,))

    def make_step(cached: bool, want_cache: bool = True):
        def step(params, sample, latents, gate, cache=None):
            pnp_state = pnp_lib.PnPState(
                masks=pyr, masks_soft=pyr,
                gate_spatial=gate, gate_temporal=gate, gate_conv=gate,
            )
            kw = {**inputs, "sample": sample}
            if cached:
                eps = model.apply(params, **kw, pnp=pnp_state, cached_encoder=cache)
                new_cache = cache
            elif want_cache:
                eps, new_cache = model.apply(params, **kw, pnp=pnp_state,
                                             return_encoder=True)
            else:
                # reuse off: returning the encoder cache would add a
                # batch-(N+3) feature pytree (~4 GB at 720p) to the outputs
                eps, new_cache = model.apply(params, **kw, pnp=pnp_state), None
            eps_g = eps[3] + 9.0 * (eps[4] - eps[3])
            new_latents = ddim.step(eps_g, inputs["timestep"][0], latents, 50)
            new_sample = jnp.concatenate(
                [sample[: n_obj + 1], new_latents[None].astype(dtype),
                 new_latents[None].astype(dtype)], axis=0)
            return new_sample, new_latents, new_cache
        if cached:
            return jax.jit(step, donate_argnums=(1, 4))
        # the fresh variant must not take the cache as a traced arg (its
        # structure changes None->arrays between warmup and loop, forcing a
        # recompile inside the timed region)
        return jax.jit(lambda params, sample, latents, gate: step(
            params, sample, latents, gate), donate_argnums=(1,))

    latents = inputs["sample"][0].astype(jnp.float32)
    return (make_step, make_two_pass_step, make_stream_step, make_pab_step, params,
            inputs["sample"], latents)


def run_e2e(natural: bool, height_lat: int = 64, width_lat: int = 64,
            n_frames: int = 16, invert_steps: int = 500,
            compose_steps: int = 50, stream: bool = True,
            mesh_devices: int = 0, batch: bool = False, reuse: int = 1,
            reuse_depth=None, reuse_deep: bool = False,
            capture_reuse: int = 1, capture_reuse_deep: bool = False,
            inv_reuse: int = 0, inv_reuse_deep: bool = False,
            int8=False, temporal_window=None,
            stream_traj: bool = False):
    """End-to-end MVOC workflow wall-clock: DDIM-invert the background +
    2 object videos (500 steps each, cfg=1, like the reference's stage 1 —
    reference: group_inversion/template.yaml:30-34) then run the 50-step
    PnP composite (stage 2).  Random weights/inputs; the compute graph,
    shapes and schedules are the real ones.

    --batch: the 3 inversions ride the UNet batch axis as ONE scan
    (core.ddim_inversion_batch_core) instead of running serially.
    --mesh N: shard over an N-device (job, seq, model) mesh — inversions
    padded onto the job axis, composite onto (seq, model).  When fewer
    than N real devices exist, self-configures N virtual CPU devices and
    switches to TINY shapes: a correctness/scaling-path demonstration of
    the exact multi-chip program, not a performance number.
    --reuse k: training-free encoder reuse in both stages (approximate)."""
    import time as _time

    import jax

    virtual = False
    if mesh_devices and mesh_devices > 1 and len(jax.devices()) < mesh_devices:
        # the probe above initialized the (single-chip) backend; drop it,
        # THEN reconfigure — both configs reject updates on a live backend
        import jax.extend.backend

        jax.extend.backend.clear_backends()
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", mesh_devices)
        assert len(jax.devices()) >= mesh_devices, "virtual CPU mesh failed"
        virtual = True

    if not virtual:
        # persistent compile cache (skip for the virtual CPU mesh: AOT CPU
        # executables don't port across host machine feature sets)
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.mvoc_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp

    from mvoc_tpu import pnp as pnp_lib
    from mvoc_tpu.models.unet_i2vgen import I2VGenXLUNet, UNetConfig
    from mvoc_tpu.ops.ddim import (DDIM, SchedulerConfig, inversion_timesteps,
                                   sampling_timesteps)
    from mvoc_tpu.parallel import mesh as pm
    from mvoc_tpu.pipeline import core

    if virtual:
        import dataclasses as _dc

        cfg = _dc.replace(UNetConfig.tiny(), temporal_natural_layout=natural)
        F, H, W = 8, 8, 8
        # the compose timestep grid (spacing 125) must be a subset of the
        # inversion grid (spacing 25), like 50-vs-500 at full scale
        invert_steps, compose_steps = 40, 8
        dtype = jnp.float32
    elif os.environ.get("MVOC_E2E_TINY"):
        # CI smoke of the e2e code paths (incl. --frames 64 trajectory
        # streaming) at tiny scale — NOT a performance configuration
        import dataclasses as _dc

        cfg = _dc.replace(UNetConfig.tiny(), temporal_natural_layout=natural,
                          temporal_window=4 if temporal_window else None)
        F, H, W = 8, 8, 8
        invert_steps, compose_steps = 40, 8
        dtype = jnp.float32
    else:
        cfg = UNetConfig(temporal_natural_layout=natural,
                         temporal_window=temporal_window)
        F, H, W = n_frames, height_lat, width_lat
        dtype = jnp.bfloat16
    n_obj = 2
    model = I2VGenXLUNet(cfg, dtype=dtype)
    rng = np.random.default_rng(0)

    mesh_inv = mesh_comp = None
    if mesh_devices and mesh_devices > 1:
        n = mesh_devices
        job = 4 if n % 4 == 0 else (2 if n % 2 == 0 else 1)
        mesh_inv = pm.make_mesh(n, job=job)
        mesh_comp = pm.make_mesh(n)

    def mk(*shape):
        return jnp.asarray(rng.standard_normal(shape), dtype=dtype)

    def cond_for(b):
        return core.UNetConditioning(
            encoder_hidden_states=mk(b, 77, cfg.cross_attention_dim),
            image_latents_first=mk(b, F, H, W, 4),
            image_latents=mk(b, F, H, W, 4),
            image_embeddings=mk(b, F, cfg.cross_attention_dim),
            fps=jnp.asarray([8] * b),
        )

    init_inputs = dict(
        sample=mk(1, F, H, W, 4), timestep=jnp.asarray([981]),
        fps=jnp.asarray([8]), image_latents_first=mk(1, F, H, W, 4),
        image_latents=mk(1, F, H, W, 4),
        image_embeddings=mk(1, F, cfg.cross_attention_dim),
        encoder_hidden_states=mk(1, 77, cfg.cross_attention_dim),
    )
    params = jax.jit(lambda: model.init(jax.random.key(0), **init_inputs))()
    if dtype == jnp.bfloat16:
        params = jax.jit(lambda p: jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            p))(params)
    if int8:
        # int8 is False | True/"full" | "mixed" (the probe-measured winner
        # selection — quantize.mixed_unet_predicate)
        from mvoc_tpu.ops.quantize import (default_unet_predicate,
                                           mixed_unet_predicate,
                                           quantize_params)

        pred = mixed_unet_predicate if int8 == "mixed" else default_unet_predicate
        params = jax.jit(lambda p: quantize_params(p, predicate=pred))(params)
    ddim = DDIM(SchedulerConfig())

    def make_apply(mesh):
        # per-stage model: the stage's mesh is threaded through the config so
        # Pallas kernels dispatch inside shard_map over it (params unchanged)
        import dataclasses as _dc

        m = (I2VGenXLUNet(_dc.replace(cfg, attn_mesh=mesh), dtype=dtype)
             if mesh is not None else model)
        if reuse_depth:
            # partial-depth encoder reuse (inert unless caching kwargs used)
            return lambda p, **kw: m.apply(
                p, **kw, encoder_reuse_depth=int(reuse_depth))
        return lambda p, **kw: m.apply(p, **kw)

    apply = make_apply(mesh_inv)
    apply_comp = make_apply(mesh_comp)

    # --- stage 1: 3 inversions (bg + 2 objects) -------------------------
    # the scan runs in CHUNKS of bounded wall-time per XLA execution: a
    # single 500-step program executes for minutes, which faults the
    # remote-TPU watchdog (single-step executions of ~seconds are fine)
    inv_ts_np = np.asarray(inversion_timesteps(SchedulerConfig(), invert_steps))
    # inversion-stage reuse: --reuse applies to BOTH stages (and overrides
    # the composite's capture-reuse); --inv_reuse accelerates stage 1 alone,
    # so it composes with --capture_reuse on stage 2 — the strongest
    # combined configuration the north star wants measured.
    inv_k = inv_reuse if inv_reuse else reuse
    inv_deep = inv_reuse_deep if inv_reuse else reuse_deep
    # stage-keyed temporal-conv rule: inversion programs trace on the XLA
    # conv emitter (measured faster there — ops/conv.tconv_override doc);
    # the composite below traces under the default stack3 dispatch.  The
    # override matters at TRACE time, i.e. the warmup calls below.
    from mvoc_tpu.ops import conv as _conv_forms

    traj_info = {}
    if stream_traj:
        assert not (batch or mesh_inv is not None), (
            "--frames 64 trajectory streaming uses the serial inversion path")
    reuse_kw = {}
    if inv_k > 1:
        reuse_kw = dict(encoder_reuse_interval=int(inv_k),
                        deep_reuse=bool(inv_deep))

    # --- stage 2 SETUP + COMPILE first (trajectories zero-filled) --------
    # The composite program compiles BEFORE the ~25-min inversion runs so
    # a timeout/retry leaves the compile committed to the persistent cache
    # (the flaky remote-compile service made long attempts all-or-nothing;
    # r5 e2e_720p attempts died after the inversion, losing everything).
    full_ts = sampling_timesteps(SchedulerConfig(), compose_steps)
    run_ts = np.asarray(full_ts[1:])  # ddim_init_latents_t_idx = 1
    S = len(run_ts)
    masks = np.zeros((n_obj, F, H, W), np.float32)
    masks[0, :, : H // 2] = 1.0
    masks[1, :, :, : W // 2] = 1.0
    res = [(H, W), ((H + 1) // 2, (W + 1) // 2), ((H + 3) // 4, (W + 3) // 4)]
    pyr = {k: jnp.asarray(v)
           for k, v in pnp_lib.build_mask_pyramid(masks, res).items()}
    gates = pnp_lib.injection_gates(full_ts, run_ts, compose_steps,
                                    0.8, 0.8, 0.8)
    # streamed mode keeps the [S, ...] trajectories HOST-side and
    # device-puts only each c_chunk slice at call time (~90 MB): the
    # resident arrays (615 MB at 64f, 540 MB at 720p) plus the composite
    # working set measured RESOURCE_EXHAUSTED at 64f
    _traj_arr = (lambda *s: np.zeros(s, np.float32)) if stream_traj \
        else (lambda *s: jnp.zeros(s, jnp.float32))
    sched = core.CompositeSchedule(
        bg_traj=_traj_arr(S, F, H, W, 4),
        obj_traj=_traj_arr(S, n_obj, F, H, W, 4),
        obj_fusion_lat=jnp.zeros((n_obj, F, H, W, 4), jnp.float32),
        gate_spatial=jnp.asarray(gates["spatial"]),
        gate_temporal=jnp.asarray(gates["temporal"]),
        gate_conv=jnp.asarray(gates["conv"]),
        fusion_mask=jnp.asarray([i < 3 for i in range(S)]),
        timesteps=jnp.asarray(run_ts),
    )
    condN = cond_for(n_obj + 3)
    cw = pnp_lib.build_capture_weights(pyr, pyr, True) if stream else None
    comp_kw = {}
    if reuse > 1:
        comp_kw = dict(encoder_reuse_interval=int(reuse))
    elif capture_reuse > 1:
        assert stream, "--capture_reuse composes with the stream composite"
        comp_kw = dict(capture_reuse_interval=int(capture_reuse),
                       capture_reuse_deep=bool(capture_reuse_deep))
    params_comp = params
    svc = None
    if mesh_comp is not None:
        import dataclasses as _dc

        params_comp = pm.shard_params(params, mesh_comp)
        svc = lambda t, ax: pm.shard_video(t, mesh_comp, frame_axis=ax)
        sched = _dc.replace(
            sched, bg_traj=svc(sched.bg_traj, 1), obj_traj=svc(sched.obj_traj, 2),
            obj_fusion_lat=svc(sched.obj_fusion_lat, 1))
        condN = _dc.replace(
            condN, image_latents_first=svc(condN.image_latents_first, 1),
            image_latents=svc(condN.image_latents, 1))
    compose_fn = jax.jit(lambda p, lat, c, s: core.pnp_composite_core(
        apply_comp, ddim, p, lat, c, s, jnp.asarray(masks), pyr, pyr,
        num_inference_steps=compose_steps, guidance_scale=9.0,
        random_noise_ratio=0.5, two_pass="stream" if stream else False,
        capture_weights=cw, **comp_kw))
    xT = mk(F, H, W, 4).astype(jnp.float32)
    if mesh_comp is not None:
        xT = pm.shard_video(xT, mesh_comp, frame_axis=0)

    def sched_slice(lo, hi):
        import dataclasses as dc
        # host-side trajectories (stream_traj) become device arrays here,
        # one chunk at a time; device-resident ones are cheap slices
        return dc.replace(
            sched,
            bg_traj=jnp.asarray(sched.bg_traj[lo:hi], jnp.float32),
            obj_traj=jnp.asarray(sched.obj_traj[lo:hi], jnp.float32),
            gate_spatial=sched.gate_spatial[lo:hi],
            gate_temporal=sched.gate_temporal[lo:hi],
            gate_conv=sched.gate_conv[lo:hi],
            fusion_mask=sched.fusion_mask[lo:hi],
            timesteps=sched.timesteps[lo:hi])

    # bounded executions (watchdog); chunks share one compiled program
    c_chunk = 7  # 49 run steps = 7 x 7
    while S % c_chunk != 0:
        c_chunk -= 1
    jax.block_until_ready(
        compose_fn(params_comp, xT, condN, sched_slice(0, c_chunk)))  # compile

    # --- stage 1: inversions ---------------------------------------------
    if batch or mesh_inv is not None:
        # batched inversion: J videos on the UNet batch axis; under a mesh
        # the J axis is padded to the "job" width so every slice owns a video
        J = n_obj + 1
        if mesh_inv is not None:
            job = mesh_inv.shape[pm.JOB_AXIS]
            J = ((J + job - 1) // job) * job  # pad (the extra row is waste)
        condJ = cond_for(J)
        params_inv = params
        if mesh_inv is not None:
            import dataclasses as _dc

            params_inv = pm.shard_params(params, mesh_inv)
            sv = lambda t: pm.shard_stacked_video(t, mesh_inv)
            condJ = _dc.replace(
                condJ, image_latents_first=sv(condJ.image_latents_first),
                image_latents=sv(condJ.image_latents))
        chunk = 20 if not virtual else invert_steps
        while invert_steps % chunk != 0:
            chunk -= 1
        invert_fn = jax.jit(lambda p, x, c, ts: core.ddim_inversion_batch_core(
            apply, ddim, p, x, c, ts, invert_steps, **reuse_kw))
        x0 = mk(J, F, H, W, 4).astype(jnp.float32)
        if mesh_inv is not None:
            x0 = pm.shard_stacked_video(x0, mesh_inv)
        with _conv_forms.tconv_override("xla"):
            jax.block_until_ready(invert_fn(params_inv, x0, condJ,
                                            jnp.asarray(inv_ts_np[:chunk])))
        t0 = _time.perf_counter()
        parts, cur = [], x0
        for s in range(0, invert_steps, chunk):
            seg = invert_fn(params_inv, cur, condJ,
                            jnp.asarray(inv_ts_np[s : s + chunk]))
            cur = seg[-1]
            parts.append(seg)
        traj_all = jnp.concatenate(parts, axis=0)  # [S, J, F, H, W, 4]
        jax.block_until_ready(traj_all)
        t_invert = _time.perf_counter() - t0
        trajs = [traj_all[:, j] for j in range(n_obj + 1)]
    else:
        chunk = min(50, invert_steps)
        while invert_steps % chunk != 0:
            chunk -= 1
        invert_fn = jax.jit(lambda p, x0, c, ts: core.ddim_inversion_core(
            apply, ddim, p, x0, c, ts, invert_steps, 1.0, **reuse_kw))
        cond1 = cond_for(1)
        x0 = mk(F, H, W, 4).astype(jnp.float32)
        # compile outside the timed region (the persistent cache makes repeat
        # runs realistic); execution is timed
        with _conv_forms.tconv_override("xla"):
            jax.block_until_ready(invert_fn(params, x0, cond1,
                                            jnp.asarray(inv_ts_np[:chunk])))

        def invert_video(x0_j):
            parts = []
            cur = x0_j
            for s in range(0, invert_steps, chunk):
                seg = invert_fn(params, cur, cond1,
                                jnp.asarray(inv_ts_np[s : s + chunk]))
                cur = seg[-1]
                # streamed mode: each chunk leaves HBM as soon as it is
                # produced — device memory holds ONE chunk of trajectory
                # instead of [steps, F, H, W, 4] (2.1 GB/video fp32 at 64f)
                parts.append(np.asarray(seg) if stream_traj else seg)
            if not stream_traj:
                return jnp.concatenate(parts, axis=0)
            return np.concatenate(parts, axis=0)

        t0 = _time.perf_counter()
        trajs = []
        if stream_traj:
            # the production contract (C9): trajectories round-trip
            # through the TrajectoryStore (C++ mmap codec, fp16, threaded)
            # and stage 2 random-access-gathers only the steps it needs
            import tempfile

            from mvoc_tpu.io.trajectory import TrajectoryStore

            traj_dir = tempfile.mkdtemp(prefix="mvoc_bench_traj_")
            stores = []
            for j in range(n_obj + 1):
                x0_j = mk(F, H, W, 4).astype(jnp.float32)
                traj_host = invert_video(x0_j)
                store = TrajectoryStore(os.path.join(traj_dir, f"v{j}"))
                written = store.save(inv_ts_np, traj_host)
                stores.append(store)
                traj_info = {
                    "traj_bytes_per_video": os.path.getsize(written),
                    "traj_backend": os.path.splitext(written)[1].lstrip("."),
                }
            t_invert = _time.perf_counter() - t0
            trajs = stores  # stage 2 gathers from the stores
        else:
            for j in range(n_obj + 1):
                x0_j = mk(F, H, W, 4).astype(jnp.float32)
                trajs.append(invert_video(x0_j))
            jax.block_until_ready(trajs)
            t_invert = _time.perf_counter() - t0

    # --- stage 2: fill the schedule with the real trajectories -----------
    import dataclasses as _dcr

    if stream_traj:
        # random-access gather of ONLY the composite's timesteps from the
        # on-disk stores (native/traj_codec.cpp random-access step reads)
        gathered = [st.gather([int(t_) for t_ in run_ts]) for st in trajs]
        bg_traj = gathered[0]
        obj_traj = np.stack([gathered[1], gathered[2]], axis=1)
        import shutil as _sh

        _sh.rmtree(os.path.dirname(trajs[0].path), ignore_errors=True)
    else:
        # trajectory entries at the run timesteps (ascending store -> index
        # map), all HBM-resident
        inv_np = [np.asarray(t_) for t_ in trajs]
        idx_of = {int(t_): i for i, t_ in enumerate(inv_ts_np)}
        sel = [idx_of[int(t_)] for t_ in run_ts if int(t_) in idx_of]
        assert len(sel) == S, "compose timesteps must be a subset of inversion's"
        bg_traj = inv_np[0][sel]
        obj_traj = np.stack([inv_np[1][sel], inv_np[2][sel]], axis=1)
    if stream_traj:
        # trajectories stay host-side; sched_slice device-puts each chunk
        bg_dev = np.asarray(bg_traj, np.float32)
        obj_dev = np.asarray(obj_traj, np.float32)
    else:
        bg_dev = jnp.asarray(bg_traj, jnp.float32)
        obj_dev = jnp.asarray(obj_traj, jnp.float32)
    fus_dev = jnp.asarray(obj_traj[0], jnp.float32)
    if svc is not None:
        bg_dev, obj_dev, fus_dev = svc(bg_dev, 1), svc(obj_dev, 2), svc(fus_dev, 1)
    sched = _dcr.replace(sched, bg_traj=bg_dev, obj_traj=obj_dev,
                         obj_fusion_lat=fus_dev)

    t0 = _time.perf_counter()
    lat = xT
    for s0 in range(0, S, c_chunk):
        lat = compose_fn(params_comp, lat, condN, sched_slice(s0, s0 + c_chunk))
    jax.block_until_ready(lat)
    t_compose = _time.perf_counter() - t0

    total = t_invert + t_compose
    # honest per-stage flops (jaxpr walker: scan x trips, pallas x grid);
    # chunks share one compiled program, so walk one chunk and multiply
    mfu = {}
    if not virtual:
        try:
            n_inv_programs = invert_steps // chunk
            if batch or mesh_inv is not None:
                inv_flops = cost_flops(
                    invert_fn, params_inv, x0, condJ,
                    jnp.asarray(inv_ts_np[:chunk])) * n_inv_programs
            else:
                inv_flops = cost_flops(
                    invert_fn, params, x0, cond1,
                    jnp.asarray(inv_ts_np[:chunk])) * n_inv_programs * (n_obj + 1)
            comp_flops = cost_flops(
                compose_fn, params_comp, xT, condN,
                sched_slice(0, c_chunk)) * (S // c_chunk)
            peak = peak_tflops_per_sec()
            mfu = {
                "invert_tflops": round(inv_flops / 1e12, 1),
                "compose_tflops": round(comp_flops / 1e12, 1),
                "invert_tflops_per_sec": round(inv_flops / t_invert / 1e12, 2),
                "compose_tflops_per_sec": round(comp_flops / t_compose / 1e12, 2),
            }
            if peak:
                mfu["invert_mfu"] = round(inv_flops / t_invert / peak, 4)
                mfu["compose_mfu"] = round(comp_flops / t_compose / peak, 4)
        except Exception:
            pass
    shape_tag = ("tiny_virtual" if virtual
                 else f"{n_frames}f_720p" if (height_lat, width_lat) == (90, 160)
                 else f"{n_frames}f_512px")
    if temporal_window and not virtual:
        shape_tag += f"_window{temporal_window}"
    if os.environ.get("MVOC_E2E_TINY") and not virtual:
        shape_tag = "tinysmoke_" + shape_tag
    print(json.dumps({
        "metric": "e2e_invert3x%d_compose%d_%s_wall_seconds"
        % (invert_steps, compose_steps, shape_tag)
        + ("_mesh%d" % mesh_devices if mesh_devices else "")
        + ("_batch" if (batch or mesh_inv is not None) else "")
        + ("_reuse%d" % reuse if reuse > 1 else "")
        + ("d%d" % reuse_depth if reuse > 1 and reuse_depth else "")
        + ("deep" if reuse > 1 and reuse_deep else "")
        + ("_invreuse%d%s" % (inv_reuse, "deep" if inv_reuse_deep else "")
           if inv_reuse > 1 else "")
        + ("_capreuse%d%s" % (capture_reuse, "deep" if capture_reuse_deep
                              else "") if capture_reuse > 1 else "")
        + ("" if not int8 else "_int8mix" if int8 == "mixed" else "_int8"),
        "value": round(total, 2),
        "unit": "s",
        "vs_baseline": None,
        "breakdown": {"invert_s": round(t_invert, 2),
                      "compose_s": round(t_compose, 2),
                      "virtual_cpu_mesh": virtual,
                      "mesh": dict(mesh_comp.shape) if mesh_comp else None,
                      **traj_info, **mfu},
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=["smoke", "full", "full720", "long64",
                                         "e2e", "quality"],
                    default="full")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--reuse", type=int, default=1,
                    help="encoder-reuse interval (1 = exact; k>1 recomputes "
                    "the UNet encoder every k-th step)")
    ap.add_argument("--two_pass", action="store_true",
                    help="capture sources then consume on edits (exact; "
                    "lower peak memory)")
    ap.add_argument("--stream", action="store_true",
                    help="two-pass with streamed per-branch capture "
                    "(exact; one-branch peak memory)")
    ap.add_argument("--natural", action="store_true",
                    help="frame-major temporal transformers (no layout "
                    "transposes at non-edit sites; exact)")
    ap.add_argument("--reuse_depth", type=int, default=None,
                    help="partial-depth encoder reuse: cache only down "
                    "blocks K.. + mid (smaller cache; fits 720p)")
    ap.add_argument("--reuse_deep", action="store_true",
                    help="(e2e, with --reuse k) cached INVERSION steps also "
                    "broadcast up-block attention outputs (PAB): cached "
                    "step = up-block convs/FF + DDIM-inverse only")
    ap.add_argument("--capture_reuse", type=int, default=1,
                    help="(--stream) broadcast captured PnP source features "
                    "for k-1 of every k steps — skips the N+1 capture "
                    "forwards on cached steps (approximate; 1 = off/exact)")
    ap.add_argument("--capture_reuse_deep", action="store_true",
                    help="(--capture_reuse k) cached steps also reuse the "
                    "edit encoder + up-block attention outputs (strongest "
                    "approximation: cached step = edit up-block convs/FF "
                    "+ CFG + DDIM)")
    ap.add_argument("--pab", type=int, default=1,
                    help="PAB attention-output broadcast interval on the "
                    "fused path (approximate; 1 = off/exact)")
    ap.add_argument("--mesh", type=int, default=0,
                    help="(e2e) shard over an N-device (job, seq, model) "
                    "mesh; uses N virtual CPU devices at tiny shapes when "
                    "fewer real devices exist")
    ap.add_argument("--batch", action="store_true",
                    help="(e2e) run the 3 inversions as one batched scan")
    ap.add_argument("--frames", type=int, choices=[16, 64], default=16,
                    help="(e2e) video length; 64 = long-video config "
                    "(windowed temporal attention, trajectories streamed "
                    "through the on-disk store)")
    ap.add_argument("--res", type=int, choices=[512, 720], default=512,
                    help="(e2e) pixel resolution: 512 -> 64x64 latents, "
                    "720 -> the reference's 90x160 (1280x720)")
    ap.add_argument("--inv_reuse", type=int, default=0,
                    help="(e2e) encoder-reuse interval for the INVERSION "
                    "stage only (composes with --capture_reuse on the "
                    "composite stage; 0 = follow --reuse)")
    ap.add_argument("--inv_reuse_deep", action="store_true",
                    help="(e2e, with --inv_reuse k) cached inversion steps "
                    "also broadcast up-block attention outputs")
    ap.add_argument("--trace", default=None, metavar="DIR",
                    help="(step presets; not e2e/quality) capture a "
                    "jax.profiler trace of the measured iterations into DIR "
                    "and print the device-op breakdown "
                    "(utils.profiling.device_op_breakdown) to stderr")
    ap.add_argument("--int8", action="store_true",
                    help="(step presets) w8a8-quantize the UNet kernels "
                    "(ops/quantize; approximate — drift in --preset "
                    "quality); metric gains an _int8 suffix")
    ap.add_argument("--int8_mixed", action="store_true",
                    help="(step presets) w8a8-quantize ONLY the probe-"
                    "measured int8 winners (1280-tier GEMMs + deep temporal "
                    "convs as s8 stack3 dots — quantize.mixed_unet_"
                    "predicate); metric gains an _int8mix suffix")
    args = ap.parse_args()
    if args.trace and args.preset in ("e2e", "quality"):
        ap.error("--trace applies to the step presets, not e2e/quality")
    if (args.int8 or args.int8_mixed) and args.preset == "quality":
        ap.error("--int8 applies to the step/e2e presets (quality reports "
                 "int8 drift on its own)")
    if args.int8 and args.int8_mixed:
        ap.error("--int8 and --int8_mixed are exclusive")

    import jax

    if os.environ.get("MVOC_BENCH_CPU"):
        # jax is preimported on the axon TPU platform in this image, so the
        # JAX_PLATFORMS env var is too late — switch via config before any
        # backend use (CI / TPU-outage fallback)
        jax.config.update("jax_platforms", "cpu")
    elif not os.environ.get("MVOC_BENCH_NO_PROBE"):
        # bounded liveness probe BEFORE any in-process backend use: during an
        # axon outage jax.devices() hangs forever, which round 2 proved turns
        # the bench artifact into a timeout/traceback.  Virtual-mesh e2e runs
        # and the CPU-scale quality preset don't need the real backend.
        needs_tpu = not (args.preset == "quality"
                         or (args.preset == "e2e" and args.mesh
                             and args.mesh > 1))
        if needs_tpu:
            ok, probe_log = probe_backend()
            if not ok:
                base = {
                    "full": "composite_denoise_steps_per_sec_per_chip_16f_512px",
                    "full720": "composite_denoise_steps_per_sec_per_chip_16f_720p",
                    "long64": "composite_denoise_steps_per_sec_per_chip_64f_512px_window16",
                    "smoke": "composite_denoise_steps_per_sec_smoke",
                    "e2e": "e2e_invert3x500_compose50_wall_seconds",
                }[args.preset]
                emit_unavailable(base, probe_log)
                return 0

    if (args.preset == "full" and not args.two_pass and not args.stream
            and not args.natural and args.reuse == 1 and args.pab == 1
            and not os.environ.get("MVOC_BENCH_FUSED")):
        # default = the recommended production configuration: streamed
        # capture + frame-major temporal layout.  EXACT w.r.t. the fused
        # reference-semantics step (tested); set MVOC_BENCH_FUSED=1 or pass
        # explicit flags to measure other modes.
        args.stream = True
        args.natural = True

    if args.preset == "quality":
        # exact-vs-approximate latent drift per acceleration knob at
        # CPU-tractable tiny scale (VERDICT r2 directive #3).  Metric value =
        # the WORST composite-mode latent PSNR (higher is better); the full
        # per-mode table rides in "modes".  Runs on CPU or TPU (tiny shapes).
        from mvoc_tpu.utils.quality import approx_quality_report

        report = approx_quality_report()
        worst = min(v["psnr_db"] for k, v in report.items()
                    if not k.startswith("inv_"))
        print(json.dumps({
            "metric": "approx_mode_worst_latent_psnr_tiny",
            "value": round(worst, 2),
            "unit": "dB",
            "vs_baseline": None,
            "modes": report,
            "note": "tiny-scale random-weight drift of each approximate "
                    "mode vs its exact baseline (algorithmic cache-wiring "
                    "check; visual quality needs real weights)",
        }))
        return

    if args.preset == "e2e":
        # natural (frame-major) temporal layout is exact and measured faster
        # in every configuration — default on unless other flags were given
        if not args.two_pass and not os.environ.get("MVOC_BENCH_STANDARD"):
            args.natural = True
        hl, wl = (90, 160) if args.res == 720 else (64, 64)
        # 64-frame long video (BASELINE configs[3]): windowed temporal
        # attention + trajectories streamed through the on-disk store
        # (HBM holds one scan chunk, not [500, 64, h, w, 4]).  720p also
        # streams: three resident [500,16,90,160,4] fp32 trajectories are
        # 5.5 GB of HBM the exact e2e measured itself out of
        # (RESOURCE_EXHAUSTED, TPU_RUNS_r05.log e2e_720p_exact attempt 1).
        long_video = args.frames == 64
        run_e2e(natural=args.natural, stream=not args.two_pass,
                height_lat=hl, width_lat=wl, n_frames=args.frames,
                temporal_window=16 if long_video else None,
                stream_traj=long_video or args.res == 720,
                mesh_devices=args.mesh, batch=args.batch, reuse=args.reuse,
                reuse_depth=args.reuse_depth, reuse_deep=args.reuse_deep,
                capture_reuse=args.capture_reuse,
                capture_reuse_deep=args.capture_reuse_deep,
                inv_reuse=args.inv_reuse, inv_reuse_deep=args.inv_reuse_deep,
                int8="mixed" if args.int8_mixed else args.int8)
        return

    iters = args.iters or (10 if args.preset.startswith("full")
                           else 4 if args.preset == "long64" else 2)
    make_step, make_two_pass, make_stream, make_pab, params, sample, latents = build(
        args.preset, natural=args.natural, reuse_depth=args.reuse_depth)
    import jax.numpy as jnp

    if args.int8 or args.int8_mixed:
        # load-time param transform; QuantConv/QuantDense dispatch on the
        # kernel leaf type, every step program below is otherwise unchanged
        from mvoc_tpu.ops.quantize import (default_unet_predicate,
                                           mixed_unet_predicate,
                                           quantize_params)

        pred = mixed_unet_predicate if args.int8_mixed else default_unet_predicate
        params = jax.jit(lambda p: quantize_params(p, predicate=pred))(params)
        jax.block_until_ready(params)
        global METRIC_SUFFIX
        METRIC_SUFFIX = "_int8mix" if args.int8_mixed else "_int8"

    gate = jnp.asarray(True)  # traced input: injection work cannot be DCE'd
    if args.stream and args.capture_reuse > 1:
        assert args.reuse == 1 and args.pab == 1, (
            "--capture_reuse composes with --stream alone")
        import time as _time

        k = args.capture_reuse
        st_fresh = make_stream(cap_fresh=True, deep=args.capture_reuse_deep)
        st_cached = make_stream(cap_cached=True, deep=args.capture_reuse_deep)
        s, l, c = st_fresh(params, sample, latents, gate)
        jax.block_until_ready((s, l))
        s, l = st_cached(params, s, l, gate, c)  # compile warmup
        jax.block_until_ready((s, l))
        t0 = _time.perf_counter()
        s, l = st_cached(params, s, l, gate, c)
        jax.block_until_ready((s, l))
        t_cached = _time.perf_counter() - t0  # one BLOCKED post-compile step
        t0 = _time.perf_counter()
        s, l, c = st_fresh(params, s, l, gate)
        jax.block_until_ready((s, l))
        t_fresh = _time.perf_counter() - t0
        t_ref = (t_fresh + (k - 1) * t_cached) / k  # expected mixed step

        def body(i):
            nonlocal s, l, c
            if i % k != 0:
                s, l = st_cached(params, s, l, gate, c)
            else:
                s, l, c = st_fresh(params, s, l, gate)

        costs = [(cost_flops(st_fresh, params, s, l, gate), 1.0 / k),
                 (cost_flops(st_cached, params, s, l, gate, c), (k - 1.0) / k)]
        dt, anomaly = timed_loop(iters, body, lambda: (s, l), t_ref,
                                 args.trace, t_floor=step_floor(costs))
        emit({
            "metric": {
                "full": "composite_denoise_steps_per_sec_per_chip_16f_512px",
                "full720": "composite_denoise_steps_per_sec_per_chip_16f_720p",
                "long64": "composite_denoise_steps_per_sec_per_chip_64f_512px_window16",
                "smoke": "composite_denoise_steps_per_sec_smoke",
            }[args.preset] + f"_stream_capreuse{k}"
            + ("deep" if args.capture_reuse_deep else "")
            + ("_natural" if args.natural else ""),
            "value": round(iters / dt, 4),
            "unit": "steps/s",
            "vs_baseline": None,
            **mfu_fields(costs, iters / dt),
        }, anomaly)
        return
    if args.stream:
        want_cache = args.reuse > 1
        st = make_stream(cached=False, want_cache=want_cache)
        st_cached = make_stream(cached=True) if want_cache else None
        c = None
        if want_cache:
            s, l, c = st(params, sample, latents, gate)
        else:
            s, l = st(params, sample, latents, gate)
        jax.block_until_ready((s, l))
        import time as _time

        if st_cached is not None:
            # rebind: s/c were donated into the call; compile warmup
            s, l, c = st_cached(params, s, l, gate, c)
            jax.block_until_ready((s, l))
        t0 = _time.perf_counter()
        if st_cached is not None:
            s, l, c = st_cached(params, s, l, gate, c)
        elif want_cache:
            s, l, c = st(params, s, l, gate)
        else:
            s, l = st(params, s, l, gate)
        jax.block_until_ready((s, l))
        t_ref = _time.perf_counter() - t0  # one BLOCKED post-compile step
        if st_cached is not None:  # mix in one blocked FRESH step (1/k)
            t0 = _time.perf_counter()
            s, l, c = st(params, s, l, gate)
            jax.block_until_ready((s, l))
            t_fresh = _time.perf_counter() - t0
            t_ref = (t_fresh + (args.reuse - 1) * t_ref) / args.reuse

        def body(i):
            nonlocal s, l, c
            if st_cached is not None and i % args.reuse != 0:
                s, l, c = st_cached(params, s, l, gate, c)
            elif want_cache:
                s, l, c = st(params, s, l, gate)
            else:
                s, l = st(params, s, l, gate)

        k = args.reuse
        costs = [(cost_flops(st, params, s, l, gate), 1.0 / k)]
        if st_cached is not None:
            costs.append((cost_flops(st_cached, params, s, l, gate, c),
                          (k - 1.0) / k))
        dt, anomaly = timed_loop(iters, body, lambda: (s, l), t_ref,
                                 args.trace, t_floor=step_floor(costs))
        emit({
            "metric": {
                "full": "composite_denoise_steps_per_sec_per_chip_16f_512px",
                "full720": "composite_denoise_steps_per_sec_per_chip_16f_720p",
                "long64": "composite_denoise_steps_per_sec_per_chip_64f_512px_window16",
                "smoke": "composite_denoise_steps_per_sec_smoke",
            }[args.preset] + "_stream"
            + (f"_reuse{args.reuse}" if args.reuse > 1 else "")
            + (f"d{args.reuse_depth}" if args.reuse > 1 and args.reuse_depth else "")
            + ("_natural" if args.natural else ""),
            "value": round(iters / dt, 4),
            "unit": "steps/s",
            "vs_baseline": round((iters / dt) / REFERENCE_STEPS_PER_SEC_ESTIMATE, 3)
            if args.preset == "full" and args.reuse == 1 else None,
            **mfu_fields(costs, iters / dt),
        }, anomaly)
        return
    if args.two_pass:
        want_cache = args.reuse > 1
        tp = make_two_pass(cached=False, want_cache=want_cache)
        tp_cached = make_two_pass(cached=True) if want_cache else None
        c = None
        if want_cache:
            s, l, c = tp(params, sample, latents, gate)
        else:
            s, l = tp(params, sample, latents, gate)
        jax.block_until_ready((s, l))
        import time as _time

        if tp_cached is not None:
            # rebind: s/c were donated into the call; compile warmup
            s, l, c = tp_cached(params, s, l, gate, c)
            jax.block_until_ready((s, l))
        t0 = _time.perf_counter()
        if tp_cached is not None:
            s, l, c = tp_cached(params, s, l, gate, c)
        elif want_cache:
            s, l, c = tp(params, s, l, gate)
        else:
            s, l = tp(params, s, l, gate)
        jax.block_until_ready((s, l))
        t_ref = _time.perf_counter() - t0  # one BLOCKED post-compile step
        if tp_cached is not None:  # mix in one blocked FRESH step (1/k)
            t0 = _time.perf_counter()
            s, l, c = tp(params, s, l, gate)
            jax.block_until_ready((s, l))
            t_fresh = _time.perf_counter() - t0
            t_ref = (t_fresh + (args.reuse - 1) * t_ref) / args.reuse

        def body(i):
            nonlocal s, l, c
            if tp_cached is not None and i % args.reuse != 0:
                s, l, c = tp_cached(params, s, l, gate, c)
            elif want_cache:
                s, l, c = tp(params, s, l, gate)
            else:
                s, l = tp(params, s, l, gate)

        k = args.reuse
        costs = [(cost_flops(tp, params, s, l, gate), 1.0 / k)]
        if tp_cached is not None:
            costs.append((cost_flops(tp_cached, params, s, l, gate, c),
                          (k - 1.0) / k))
        dt, anomaly = timed_loop(iters, body, lambda: (s, l), t_ref,
                                 args.trace, t_floor=step_floor(costs))
        emit({
            "metric": {
                "full": "composite_denoise_steps_per_sec_per_chip_16f_512px",
                "full720": "composite_denoise_steps_per_sec_per_chip_16f_720p",
                "long64": "composite_denoise_steps_per_sec_per_chip_64f_512px_window16",
                "smoke": "composite_denoise_steps_per_sec_smoke",
            }[args.preset] + "_two_pass"
            + (f"_reuse{args.reuse}" if args.reuse > 1 else "")
            + (f"d{args.reuse_depth}" if args.reuse > 1 and args.reuse_depth else "")
            + ("_natural" if args.natural else ""),
            "value": round(iters / dt, 4),
            "unit": "steps/s",
            "vs_baseline": None,
            **mfu_fields(costs, iters / dt),
        }, anomaly)
        return

    if args.pab > 1:
        assert not (args.two_pass or args.stream) and args.reuse == 1, (
            "--pab measures the fused path")
        pab_fresh = make_pab(cached=False)
        pab_cached = make_pab(cached=True)
        s, l, c = pab_fresh(params, sample, latents, gate)
        jax.block_until_ready((s, l))
        # rebind: s/c were donated into the call; compile warmup
        s, l, c = pab_cached(params, s, l, gate, c)
        jax.block_until_ready((s, l))
        t0 = time.perf_counter()
        s, l, c = pab_cached(params, s, l, gate, c)
        jax.block_until_ready((s, l))
        t_cached = time.perf_counter() - t0  # one BLOCKED post-compile step
        t0 = time.perf_counter()
        s, l, c = pab_fresh(params, s, l, gate)
        jax.block_until_ready((s, l))
        t_fresh = time.perf_counter() - t0
        t_ref = (t_fresh + (args.pab - 1) * t_cached) / args.pab

        def body(i):
            nonlocal s, l, c
            if i % args.pab != 0:
                s, l, c = pab_cached(params, s, l, gate, c)
            else:
                s, l, c = pab_fresh(params, s, l, gate)

        k = args.pab
        costs = [(cost_flops(pab_fresh, params, s, l, gate), 1.0 / k),
                 (cost_flops(pab_cached, params, s, l, gate, c), (k - 1.0) / k)]
        dt, anomaly = timed_loop(iters, body, lambda: (s, l), t_ref,
                                 args.trace, t_floor=step_floor(costs))
        emit({
            "metric": {
                "full": "composite_denoise_steps_per_sec_per_chip_16f_512px",
                "full720": "composite_denoise_steps_per_sec_per_chip_16f_720p",
                "long64": "composite_denoise_steps_per_sec_per_chip_64f_512px_window16",
                "smoke": "composite_denoise_steps_per_sec_smoke",
            }[args.preset] + f"_pab{args.pab}"
            + ("_natural" if args.natural else ""),
            "value": round(iters / dt, 4),
            "unit": "steps/s",
            "vs_baseline": None,
            **mfu_fields(costs, iters / dt),
        }, anomaly)
        return

    fresh_step = make_step(cached=False, want_cache=args.reuse > 1)
    cached_step = make_step(cached=True) if args.reuse > 1 else None

    # warmup / compile
    s, l, c = fresh_step(params, sample, latents, gate)
    jax.block_until_ready((s, l))
    if cached_step is not None:
        # rebind: s/c were donated into the call; compile warmup
        s, l, c = cached_step(params, s, l, gate, c)
        jax.block_until_ready((s, l))
    t0 = time.perf_counter()
    if cached_step is not None:
        s, l, c = cached_step(params, s, l, gate, c)
    else:
        s, l, c = fresh_step(params, s, l, gate)
    jax.block_until_ready((s, l))
    t_ref = time.perf_counter() - t0  # one BLOCKED post-compile step
    if cached_step is not None:  # mix in one blocked FRESH step (1/k)
        t0 = time.perf_counter()
        s, l, c = fresh_step(params, s, l, gate)
        jax.block_until_ready((s, l))
        t_fresh = time.perf_counter() - t0
        t_ref = (t_fresh + (args.reuse - 1) * t_ref) / args.reuse

    def body(i):
        nonlocal s, l, c
        if cached_step is not None and i % args.reuse != 0:
            s, l, c = cached_step(params, s, l, gate, c)
        else:
            s, l, c = fresh_step(params, s, l, gate)

    k = args.reuse
    costs = [(cost_flops(fresh_step, params, s, l, gate), 1.0 / k)]
    if cached_step is not None:
        costs.append((cost_flops(cached_step, params, s, l, gate, c),
                      (k - 1.0) / k))
    dt, anomaly = timed_loop(iters, body, lambda: (s, l), t_ref, args.trace,
                             t_floor=step_floor(costs))

    steps_per_sec = iters / dt
    emit({
        "metric": {
            "full": "composite_denoise_steps_per_sec_per_chip_16f_512px",
            "full720": "composite_denoise_steps_per_sec_per_chip_16f_720p",
            "long64": "composite_denoise_steps_per_sec_per_chip_64f_512px_window16",
            "smoke": "composite_denoise_steps_per_sec_smoke",
        }[args.preset] + (f"_reuse{args.reuse}" if args.reuse > 1 else "")
            + (f"d{args.reuse_depth}" if args.reuse > 1 and args.reuse_depth else "")
        + ("_natural" if args.natural else ""),
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC_ESTIMATE, 3)
        if args.preset == "full" else None,
        **mfu_fields(costs, steps_per_sec),
    }, anomaly)


if __name__ == "__main__":
    sys.exit(main())
