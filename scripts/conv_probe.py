"""On-chip probe: matmul-form convs (ops/conv.py) vs XLA's conv emitter.

The r4 trace showed XLA convs at 35-134 TF/s on the UNet's hot shapes while
same-shape dots run 150-180 TF/s.  This times every candidate form on every
hot shape tier and prints a decision table; ops/conv.spatial_form /
temporal_form dispatch the winners.

Timing follows the axon rules (ROUND_NOTES r3/r4): chained x = f(x) loops
with RMS renorm (identical executions get deduped; ~26 ms dispatch floor on
blocked calls), one blocked step as the validity reference.  Run only when
the measurement queue is idle — two processes sharing the chip corrupt both.
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

ITERS = 30


def _renorm(x):
    return x * jax.lax.rsqrt(
        jnp.mean(jnp.square(x.astype(jnp.float32))) + 1e-6).astype(x.dtype)


def time_chained(name, step, x0, flops_per_call):
    x = step(x0)
    x.block_until_ready()
    t0 = time.perf_counter()
    y = step(x0)
    y.block_until_ready()
    t_ref = time.perf_counter() - t0

    xs = x0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        xs = step(xs)
    xs.block_until_ready()
    per = (time.perf_counter() - t0) / ITERS
    valid = per > t_ref / 3
    if not valid:
        xs = x0
        t0 = time.perf_counter()
        for _ in range(ITERS):
            xs = step(xs)
            xs.block_until_ready()
        per = (time.perf_counter() - t0) / ITERS
        name += " (blocked-retimed)"
    eff = flops_per_call / per / 1e12
    print(f"  {name:28s} {per*1e3:8.3f} ms  {eff:7.1f} TF/s")
    return per


def spatial_case(x_shape, cc):
    print(f"3x3 conv {x_shape} C={cc}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(x_shape), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, cc, cc)) / (3 * np.sqrt(cc)),
                    jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    flops = 2.0 * np.prod(x_shape, dtype=float) * 9 * cc

    def mk(form):
        @jax.jit
        def f(x):
            return _renorm(form(x, w))
        return f

    def xla_form(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.float32).astype(x.dtype)

    res = {}
    for name, form in [("xla", xla_form), ("stack9", C.conv3x3_stack9),
                       ("wcat3", C.conv3x3_wcat3),
                       ("im2col9", C.conv3x3_im2col9)]:
        res[name] = time_chained(name, mk(form), x, flops)
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
        @jax.jit
        def f(x, form=form):
            return _renorm(form(x, w))
        res[name] = time_chained(name, f, x, flops)
    print(f"  -> stack3 {res['xla']/res['stack3']:.2f}x vs xla")
    return {k: round(res["xla"] / v, 3) for k, v in res.items()}


def main():
    global ITERS
    tiny = bool(os.environ.get("MVOC_PROBE_TINY"))
    if tiny:
        jax.config.update("jax_platforms", "cpu")
        ITERS = 3
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    out = {}
    if tiny:
        out["sp_16"] = spatial_case((2, 8, 8, 16), 16)
        out["tc_16"] = temporal_case((1, 4, 4, 4, 16), 16)
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
