"""On-chip probe: does XLA lower s8 x s8 -> s32 conv/dot onto the v5e MXU
at a real speedup over bf16?  Decision gate for the round-4 int8 w8a8 path
(ops/quantize.py): build the UNet integration only if the probe shows
>= 1.5x on the hot shapes; otherwise delete the idea (measure-and-decide).

Shapes are the flagship composite step's hot sites (16f @ 512px, stream
edit pass B=2 -> BF=32):
  * ResnetBlock2D 3x3 conv        [32, 64, 64, 320] x [3,3,320,320]
  * up-block concat 3x3 conv      [32, 64, 64, 640] x [3,3,640,320]
  * TemporalConvLayer (3,1,1)     [2, 16, 64, 64, 320] x [3,1,1,320,320]
  * FF GEGLU proj (dot)           [32*4096, 320] x [320, 2560]

Timing follows the axon rules (ROUND_NOTES r3): chained x = f(x) loops with
output feedback + RMS renorm (identical-buffer calls get deduped), one
blocked step as the validity reference, bench.timed_loop for the anomaly
guard.  Run AFTER the measurement queue drains — two processes sharing the
one chip serialize and corrupt both timings.
"""

import importlib.util
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from mvoc_tpu.ops import quantize as Q

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.mvoc_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

ITERS = 30


def _renorm(x):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x.astype(jnp.float32))) + 1e-6).astype(x.dtype)


def time_chained(name, step, x0, flops_per_call):
    """Chained x=f(x) timing with blocked-step validity (axon dedup trap)."""
    x = step(x0)  # compile + warm
    x.block_until_ready()
    t0 = time.perf_counter()
    y = step(x0)
    y.block_until_ready()
    t_ref = time.perf_counter() - t0

    # chain explicitly so each call feeds on the previous output (the axon
    # runtime dedups repeated identical executions — ROUND_NOTES r3)
    xs = x0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        xs = step(xs)
    xs.block_until_ready()
    dt = time.perf_counter() - t0
    per = dt / ITERS
    valid = per > t_ref / 3
    eff = flops_per_call / per / 1e12
    print(f"{name:34s} {per*1e3:8.2f} ms/call  {eff:7.1f} T(FL)OP/s"
          f"  (blocked ref {t_ref*1e3:.2f} ms{'' if valid else '  INVALID-retime'})")
    if not valid:
        # per-call blocking re-time
        xs = x0
        t0 = time.perf_counter()
        for _ in range(ITERS):
            xs = step(xs)
            xs.block_until_ready()
        per = (time.perf_counter() - t0) / ITERS
        print(f"{name:34s} re-timed blocked: {per*1e3:8.2f} ms/call  "
              f"{flops_per_call/per/1e12:7.1f} T(FL)OP/s")
    return per


def conv_case(name, x_shape, k_shape, strides=None):
    nd = len(k_shape) - 2
    strides = strides or (1,) * nd
    pad = [(k // 2, k // 2) for k in k_shape[:nd]]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(x_shape), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal(k_shape) / np.sqrt(np.prod(k_shape[:-1])),
                    jnp.float32)
    qw = Q.quantize_tensor(w, (w.ndim - 1,))
    wb = w.astype(jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, k_shape, ("NHWC", "HWIO", "NHWC") if nd == 2
        else ("NDHWC", "DHWIO", "NDHWC"))
    out_spatial = np.prod([x_shape[1 + i] // strides[i] for i in range(nd)])
    flops = 2.0 * x_shape[0] * out_spatial * np.prod(k_shape, dtype=float)
    assert k_shape[-2] == x_shape[-1] and k_shape[-1] == x_shape[-1], \
        "chained probe needs C_out == C_in"

    @jax.jit
    def f_bf16(x):
        return _renorm(jax.lax.conv_general_dilated(
            x, wb, strides, pad, dimension_numbers=dn,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16))

    @jax.jit
    def f_int8(x):
        return _renorm(Q.int8_conv(x, qw, strides=strides, padding=pad))

    t_b = time_chained(f"{name} bf16", f_bf16, x, flops)
    t_i = time_chained(f"{name} int8", f_int8, x, flops)
    # numerics on the real int8 path
    err = float(jnp.max(jnp.abs(
        f_int8(x).astype(jnp.float32) - f_bf16(x).astype(jnp.float32))))
    print(f"{name:34s} int8/bf16 speedup {t_b/t_i:5.2f}x   max|diff| {err:.4f}")
    return t_b / t_i


def dot_case(name, m, k, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)) / np.sqrt(k), jnp.float32)
    # chain through a fixed [n, k] back-projection so C stays square-free
    wback = jnp.asarray(rng.standard_normal((n, k)) / np.sqrt(n), jnp.bfloat16)
    qw = Q.quantize_tensor(w, (1,))
    wb = w.astype(jnp.bfloat16)
    flops = 2.0 * m * k * n

    @jax.jit
    def f_bf16(x):
        y = jax.lax.dot_general(x, wb, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return _renorm((y.astype(jnp.bfloat16) @ wback))

    @jax.jit
    def f_int8(x):
        y = Q.int8_matmul(x, qw)
        return _renorm(y @ wback)

    t_b = time_chained(f"{name} bf16", f_bf16, x, flops)
    t_i = time_chained(f"{name} int8", f_int8, x, flops)
    print(f"{name:34s} int8/bf16 speedup {t_b/t_i:5.2f}x  "
          f"(both chains share the bf16 back-projection)")
    return t_b / t_i


def main():
    global ITERS
    tiny = bool(os.environ.get("MVOC_PROBE_TINY"))  # CPU smoke of the script
    if tiny:
        jax.config.update("jax_platforms", "cpu")
        ITERS = 3
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    results = {}
    if tiny:
        results["res_conv"] = conv_case(
            "resnet 3x3 32->32", (2, 16, 16, 32), (3, 3, 32, 32))
        results["ff_dot"] = dot_case("FF tiny", 256, 64, 128)
    else:
        results["res_conv_320"] = conv_case(
            "resnet 3x3 320->320", (32, 64, 64, 320), (3, 3, 320, 320))
        results["temp_conv_320"] = conv_case(
            "temporal (3,1,1) 320->320", (2, 16, 64, 64, 320),
            (3, 1, 1, 320, 320))
        results["ff_dot"] = dot_case("FF GEGLU 4096x320x2560",
                                     32 * 4096 // 8, 320, 2560)
    print("\nDecision gate: build the int8 UNet path iff conv cases >= 1.5x.")
    print({k: round(v, 2) for k, v in results.items()})


if __name__ == "__main__":
    main()
