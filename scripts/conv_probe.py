"""On-chip probe: matmul-form convs (ops/conv.py) vs XLA's conv emitter.

The r4 trace showed XLA convs at 35-134 TF/s on the UNet's hot shapes while
same-shape dots run 150-180 TF/s.  This times every candidate form on every
hot shape tier and prints a decision table; ops/conv.spatial_form /
temporal_form dispatch the winners.

Timing: single convs here run ~1-3 ms, well under the axon remote runtime's
~26 ms blocked-dispatch floor, so neither blocked-per-step nor python-chained
loops measure them (the first probe draft read the floor for every form).
Instead each form is applied INNER times inside a jitted lax.scan (serial on
device, RMS-renormed so the body cannot be strength-reduced) at TWO scan
lengths; per-op time is the difference quotient, cancelling the dispatch
floor and any constant overhead.  Run only when the measurement queue is
idle — two processes sharing the chip corrupt both.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mvoc_tpu.ops import conv as C

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.mvoc_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

INNER_LO, INNER_HI = 16, 80
REPS = 3


def _renorm(x):
    return x * jax.lax.rsqrt(
        jnp.mean(jnp.square(x.astype(jnp.float32))) + 1e-6).astype(x.dtype)


def time_scanned(name, body, x0, flops_per_call):
    """Per-op time via two scan lengths: per = (t_hi - t_lo)/(HI - LO).

    body: x -> x (renormed op).  Each timing is one blocked dispatch of a
    jitted lax.scan; the difference quotient cancels the ~26 ms dispatch
    floor.  Best-of-REPS for each length to shed runtime jitter.
    """
    def mk(n):
        @jax.jit
        def f(x):
            return jax.lax.scan(lambda c, _: (body(c), None), x,
                                None, length=n)[0]
        return f

    f_lo, f_hi = mk(INNER_LO), mk(INNER_HI)
    ts = {}
    for key, f in (("lo", f_lo), ("hi", f_hi)):
        f(x0).block_until_ready()  # compile
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            f(x0).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        ts[key] = best
    per = (ts["hi"] - ts["lo"]) / (INNER_HI - INNER_LO)
    if per <= 0:  # jitter swamped the difference — fall back to hi alone
        per = ts["hi"] / INNER_HI
        name += " (hi-only)"
    eff = flops_per_call / per / 1e12
    print(f"  {name:28s} {per*1e3:8.3f} ms  {eff:7.1f} TF/s", flush=True)
    return per


def spatial_case(x_shape, cc, co=None):
    co = co or cc
    print(f"3x3 conv {x_shape} C={cc}->{co}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(x_shape), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, cc, co)) / (3 * np.sqrt(cc)),
                    jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    flops = 2.0 * np.prod(x_shape, dtype=float) * 9 * co

    def xla_form(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.float32).astype(x.dtype)

    def body(x, form):
        y = _renorm(form(x, w))
        if co != cc:  # rebuild the carry shape (cc is a multiple of co in
            y = jnp.concatenate([y] * (cc // co), axis=-1)  # every UNet case)
        return y

    res = {}
    for name, form in [("xla", xla_form), ("stack9", C.conv3x3_stack9),
                       ("wcat3", C.conv3x3_wcat3),
                       ("im2col9", C.conv3x3_im2col9)]:
        res[name] = time_scanned(
            name, lambda x, form=form: body(x, form), x, flops)
    best = min(res, key=res.get)
    print(f"  -> best: {best}  ({res['xla']/res[best]:.2f}x vs xla)")
    return {k: round(res["xla"] / v, 3) for k, v in res.items()}


def temporal_case(x_shape, cc):
    print(f"(3,1,1) conv {x_shape} C={cc}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(x_shape), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 1, 1, cc, cc)) / (3 * np.sqrt(cc)),
                    jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NDHWC", "DHWIO", "NDHWC"))
    flops = 2.0 * np.prod(x_shape, dtype=float) * 3 * cc

    def xla_form(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), ((1, 1), (0, 0), (0, 0)), dimension_numbers=dn,
            preferred_element_type=jnp.float32).astype(x.dtype)

    res = {}
    for name, form in [("xla", xla_form), ("stack3", C.tconv3_stack3)]:
        res[name] = time_scanned(
            name, lambda x, form=form: _renorm(form(x, w)), x, flops)
    print(f"  -> stack3 {res['xla']/res['stack3']:.2f}x vs xla")
    return {k: round(res["xla"] / v, 3) for k, v in res.items()}


def main():
    global INNER_LO, INNER_HI, REPS
    tiny = bool(os.environ.get("MVOC_PROBE_TINY"))
    if tiny:
        jax.config.update("jax_platforms", "cpu")
        INNER_LO, INNER_HI, REPS = 1, 3, 1
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    out = {}
    if tiny:
        out["sp_16"] = spatial_case((2, 8, 8, 16), 16)
        out["tc_16"] = temporal_case((1, 4, 4, 4, 16), 16)
    elif os.environ.get("MVOC_PROBE_SET") == "4":
        # the CFG edit-pass batch (BF=32) at the one geometry wcat3 won, to
        # decide whether the (1280,16,16) winner covers all batch sizes
        out["sp_1280_16x16_b32"] = spatial_case((32, 16, 16, 1280), 1280)
    elif os.environ.get("MVOC_PROBE_SET") == "3":
        # remaining c1280 spatial geometries for the wcat3-per-tier call
        out["sp_1280_8x8"] = spatial_case((16, 8, 8, 1280), 1280)
        out["sp_1280_720p"] = spatial_case((16, 23, 40, 1280), 1280)
    elif os.environ.get("MVOC_PROBE_SET") == "2":
        # missing tiers: up-block concat-widened spatial c_in + 640 temporal
        out["sp_960_b16"] = spatial_case((16, 64, 64, 960), 960, 320)
        out["sp_1920_b16"] = spatial_case((16, 32, 32, 1920), 1920, 640)
        out["sp_2560_b16"] = spatial_case((16, 16, 16, 2560), 2560, 1280)
        out["tc_640_32"] = temporal_case((1, 16, 32, 32, 640), 640)
        out["tc_640_32b2"] = temporal_case((2, 16, 32, 32, 640), 640)
        out["tc_1280_16b2"] = temporal_case((2, 16, 16, 16, 1280), 1280)
    else:
        # stream+natural composite step shapes (trace: TPU_RUNS_r04.log)
        out["sp_320_b16"] = spatial_case((16, 64, 64, 320), 320)
        out["sp_320_b32"] = spatial_case((32, 64, 64, 320), 320)
        out["sp_640_b16"] = spatial_case((16, 32, 32, 640), 640)
        out["sp_1280_b16"] = spatial_case((16, 16, 16, 1280), 1280)
        out["tc_320_f16"] = temporal_case((1, 16, 64, 64, 320), 320)
        out["tc_1280_16"] = temporal_case((1, 16, 16, 16, 1280), 1280)
        out["tc_1280_8"] = temporal_case((1, 16, 8, 8, 1280), 1280)
        out["tc_1280_8b2"] = temporal_case((2, 16, 8, 8, 1280), 1280)
    print("\nspeedups vs xla (per shape):")
    for k, v in out.items():
        print(f"  {k:14s} {v}")


if __name__ == "__main__":
    main()
