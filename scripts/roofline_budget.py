"""Per-op-class roofline budget of the flagship composite step (on-chip).

VERDICT r4 directive 3: account for where the exact step's device time
goes, per op class, against what each class could achieve — either find
the next kernel target or prove the remaining headroom is
bandwidth/epilogue-bound.  Output: one JSON blob combining

  * per-class analytic flops of one average stream step
    (utils/flops.jaxpr_matmul_flops_by_class: conv = XLA conv emitter,
    dot = XLA dot_generals incl. matmul-form convs, pallas = attention
    kernels x grid),
  * per-category device time from a fresh 10-step trace
    (utils/profiling.device_op_breakdown),
  * achieved TF/s per class and the isolated-probe achievable rates
    (scripts/conv_probe.py round-4 numbers) for the gap statement.

Trace-category -> class mapping (TPU XLA): 'convolution fusion' carries
BOTH convs and dot fusions (with their fused elementwise epilogues —
which is why its apparent TF/s trails the isolated-probe rates);
'custom-call' is the pallas kernels; everything else (data formatting,
loop fusion, copies) is non-matmul overhead.

Run only when the measurement queue is idle.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from mvoc_tpu.utils.flops import jaxpr_matmul_flops_by_class
from mvoc_tpu.utils.profiling import device_op_breakdown


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "traces/r5_roofline"
    make_step, _tp, make_stream, _pab, params, sample, latents = bench.build(
        "full", natural=True)
    # the default bench configuration: stream composite, natural layout
    step = make_stream(cached=False)

    gate = jnp.asarray(True)
    by = jaxpr_matmul_flops_by_class(
        lambda p, s, l, g: step(p, s, l, g), params, sample, latents, gate)
    total_tf = sum(by.values()) / 1e12
    print(json.dumps({"flops_by_class_tf":
                      {k: round(v / 1e12, 2) for k, v in by.items()},
                      "total_tf_per_step": round(total_tf, 2)}), flush=True)

    # 10 traced steps (same shape as bench --trace)
    out = step(params, sample, latents, gate)
    jax.block_until_ready(out)  # compile + warm
    import time

    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        o = None
        for _ in range(10):
            o = step(params, sample, latents, gate)
        jax.block_until_ready(o)
        wall = time.perf_counter() - t0

    roll = device_op_breakdown(trace_dir)
    cat = roll.get("by_category", {})
    dev_total = roll.get("total_s", 0.0)
    t_xla_mm = cat.get("convolution fusion", 0.0) / 10.0
    t_pallas = cat.get("custom-call", 0.0) / 10.0
    t_other = dev_total / 10.0 - t_xla_mm - t_pallas

    peak = bench.peak_tflops_per_sec() or float("nan")
    xla_mm_tf = (by["conv"] + by["dot"]) / 1e12
    pallas_tf = by["pallas"] / 1e12
    budget = {
        "wall_s_per_step": round(wall / 10.0, 4),
        "device_s_per_step": round(dev_total / 10.0, 4),
        "classes": {
            "xla_matmul(conv+dot w/ fused epilogues)": {
                "flops_tf": round(xla_mm_tf, 2),
                "device_s": round(t_xla_mm, 4),
                "achieved_tf_per_s": round(xla_mm_tf / t_xla_mm, 1)
                if t_xla_mm else None,
                "isolated_probe_tf_per_s": "140-221 (spatial 3x3 tiers), "
                "150-180 (dots) — conv_probe.py r4",
            },
            "pallas_attention": {
                "flops_tf": round(pallas_tf, 2),
                "device_s": round(t_pallas, 4),
                "achieved_tf_per_s": round(pallas_tf / t_pallas, 1)
                if t_pallas else None,
            },
            "non_matmul(data formatting, loop fusions, copies)": {
                "flops_tf": 0.0,
                "device_s": round(t_other, 4),
                "note": "pure overhead: bandwidth/layout-bound",
            },
        },
        "peak_tf_per_s": peak / 1e12,
        "mfu_from_trace": round(total_tf / (dev_total / 10.0) / (peak / 1e12),
                                4) if dev_total and peak == peak else None,
        "by_category_s_per_step":
            {k: round(v / 10.0, 4) for k, v in sorted(
                cat.items(), key=lambda kv: -kv[1])[:8]},
    }
    print(json.dumps(budget))


if __name__ == "__main__":
    main()
