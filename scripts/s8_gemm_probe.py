"""On-chip probe: Pallas s8 GEMM (ops/s8gemm.py) vs bf16 dot vs XLA int8.

The VERDICT r4 directive-3 experiment: XLA's int8 lowering measured a LOSS
on this workload (int8_probe.py — conv 0.8-1.15x, step 1.9x slower), but
s8 peak on v5e is 2x bf16; this probe answers whether a hand-tiled Pallas
s8 GEMM with the dequant epilogue fused into the store recovers the rate.

Build gate (same bar as round 4's int8 gate): the pallas s8 'full' variant
(dynamic per-row act quant + GEMM + dequant, i.e. everything a QuantDense
call pays) must beat the bf16 dot by >= 1.3x on the UNet's dominant GEMM
geometries, else the kernel ships probe-only and int8 stays
documented-not-recommended.

Shapes: the composite step's dominant dot_generals at 16f@512px (FF GEGLU
projections and matmul-form temporal convs; B=2 edit pass doubles M).
Timing: scan-amortized difference quotient (see conv_probe.py docstring —
single GEMMs run under the ~26 ms axon dispatch floor).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.mvoc_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from mvoc_tpu.ops.quantize import _quantize_activation, quantize_tensor
from mvoc_tpu.ops.s8gemm import s8_matmul

INNER_LO, INNER_HI = 16, 80
REPS = 3


def _renorm(x):
    return x * jax.lax.rsqrt(
        jnp.mean(jnp.square(x.astype(jnp.float32))) + 1e-6).astype(x.dtype)


def time_scanned(name, body, x0, flops_per_call):
    def mk(n):
        @jax.jit
        def f(x):
            return jax.lax.scan(lambda c, _: (body(c), None), x,
                                None, length=n)[0]
        return f

    f_lo, f_hi = mk(INNER_LO), mk(INNER_HI)
    ts = {}
    for key, f in (("lo", f_lo), ("hi", f_hi)):
        f(x0).block_until_ready()
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            f(x0).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        ts[key] = best
    per = (ts["hi"] - ts["lo"]) / (INNER_HI - INNER_LO)
    if per <= 0:
        per = ts["hi"] / INNER_HI
        name += " (hi-only)"
    eff = flops_per_call / per / 1e12
    print(f"  {name:28s} {per*1e3:8.3f} ms  {eff:7.1f} TF/s", flush=True)
    return per


def case(m, k, n, label=""):
    print(f"GEMM [{m},{k}] x [{k},{n}] {label}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)) / np.sqrt(k), jnp.bfloat16)
    wq = quantize_tensor(w, channel_axes=(1,))
    flops = 2.0 * m * k * n

    def carry_fix(y):
        # rebuild the [m, k] carry from a [m, n] result
        if n == k:
            return y
        if n > k:
            return y[:, :k]
        return jnp.concatenate([y] * (k // n + 1), axis=1)[:, :k]

    def bf16_body(x):
        y = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return _renorm(carry_fix(y.astype(jnp.bfloat16)))

    def xla_int8_body(x):
        xq, sx = _quantize_activation(x, reduce_axes=(1,))
        acc = jax.lax.dot_general(xq, wq.data, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = (acc.astype(jnp.float32)
             * (sx * wq.scale.reshape(1, -1))).astype(jnp.bfloat16)
        return _renorm(carry_fix(y))

    def pallas_full_body(x):
        xq, sx = _quantize_activation(x, reduce_axes=(1,))
        y = s8_matmul(xq, wq.data, sx[:, 0], wq.scale.reshape(-1))
        return _renorm(carry_fix(y))

    # GEMM-only variants (pre-quantized activations; isolates the MXU rate)
    xq0, sx0 = _quantize_activation(x, reduce_axes=(1,))
    sx0 = sx0[:, 0]
    sw0 = wq.scale.reshape(-1)

    def pallas_gemm_body(xq):
        y = s8_matmul(xq, wq.data, sx0, sw0)
        yq = jnp.clip(jnp.round(y.astype(jnp.float32) * 8), -127, 127)
        return carry_fix(yq).astype(jnp.int8)

    def xla_gemm_body(xq):
        acc = jax.lax.dot_general(xq, wq.data, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        yq = jnp.clip(acc, -127, 127)
        return carry_fix(yq).astype(jnp.int8)

    res = {}
    res["bf16"] = time_scanned("bf16 dot", bf16_body, x, flops)
    res["xla_s8_full"] = time_scanned("xla s8 (quant+gemm+deq)",
                                      xla_int8_body, x, flops)
    res["pallas_s8_full"] = time_scanned("pallas s8 (quant+gemm+deq)",
                                         pallas_full_body, x, flops)
    res["xla_s8_gemm"] = time_scanned("xla s8 gemm-only", xla_gemm_body,
                                      xq0, flops)
    res["pallas_s8_gemm"] = time_scanned("pallas s8 gemm-only",
                                         pallas_gemm_body, xq0, flops)
    print(f"  -> pallas full vs bf16: {res['bf16']/res['pallas_s8_full']:.2f}x"
          f", gemm-only vs bf16: {res['bf16']/res['pallas_s8_gemm']:.2f}x")
    return {kk: round(res["bf16"] / v, 3) for kk, v in res.items()}


def main():
    global INNER_LO, INNER_HI, REPS
    tiny = bool(os.environ.get("MVOC_PROBE_TINY"))
    if tiny:
        jax.config.update("jax_platforms", "cpu")
        os.environ["MVOC_PALLAS_INTERPRET"] = "1"
        INNER_LO, INNER_HI, REPS = 1, 2, 1
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    out = {}
    if tiny:
        out["t"] = case(256, 128, 128)
    else:
        # FF GEGLU at the three tiers (tokens=F*H*W, B=1 capture pass)
        out["ff_320"] = case(16 * 64 * 64, 320, 2560, "FF in, 320 tier")
        out["ff_1280"] = case(16 * 16 * 16, 1280, 10240, "FF in, 1280 tier")
        out["ff_1280_out"] = case(16 * 16 * 16, 5120, 1280, "FF out, 1280 tier")
        # attention qkv projection, 1280 tier
        out["qkv_1280"] = case(16 * 16 * 16, 1280, 1280, "attn proj")
        # matmul-form temporal conv (stack3): K=C, N=3C
        out["tconv_1280"] = case(16 * 8 * 8, 1280, 3840, "tconv stack3 8x8")
        # im2col9 spatial conv at the 1280 tier: K=9C
        out["sp9_1280"] = case(2 * 16 * 16 * 16, 9 * 1280, 1280, "im2col9 B=2")
    print("\nspeedups vs bf16 dot (per shape):")
    for k, v in out.items():
        print(f"  {k:14s} {v}")


if __name__ == "__main__":
    main()
