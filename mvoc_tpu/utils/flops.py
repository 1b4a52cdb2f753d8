"""Analytic matmul-class FLOPs accounting for bench MFU.

Why not XLA's `compiled.cost_analysis()["flops"]`: it counts `lax.scan` /
while BODIES ONCE, not x trip-count.  The stream composite's capture scan
runs (n_obj+1) branch forwards per step but contributes one body to the
reported cost, so the flagship step's flops (and therefore MFU) were
undercounted ~40% through round 3 (reported 62.3 TF/step and MFU 0.27;
true ~104 TF and ~0.45).  Pallas custom calls are fine — the kernels pass
`CostEstimate` and XLA's analysis does include it; the scan hole is the
only one (pinned by tests/test_flops.py).

`jaxpr_matmul_flops(fn, *args)` is the honest counter: it walks the jaxpr
recursively, multiplying scan bodies by trip count and pallas kernel
bodies by grid size (so the flash/frame-attention in-kernel dot_generals
are counted exactly as executed, padding included).  The StableHLO-text
walk (`matmul_flops`) and the trace-time attention tally remain as
cross-checks.
"""

from __future__ import annotations

import contextlib
import re
from typing import Any

import numpy as np


def _dims(s: str) -> list[int]:
    return [int(x) for x in re.findall(r"\d+", s)]


def stablehlo_matmul_flops(text: str) -> float:
    """Sum conv + dot_general flops from StableHLO text (one trace, no
    compile).  Conventions: 2*prod(out_shape)*contraction_size per op."""
    total = 0.0
    # stablehlo.convolution(...) : (tensor<AxBx..xf32>, tensor<KxKxIxO..>) -> tensor<OUT>
    for m in re.finditer(
            r"stablehlo\.convolution.*?tensor<([\dx]+)x\w+>.*?"
            r"tensor<([\dx]+)x\w+>\).*?tensor<([\dx]+)x\w+>", text):
        _, rhs, out = (_dims(g) for g in m.groups())
        # rhs kernel is [*spatial, I, O]; contraction per output element =
        # prod(spatial)*I = prod(rhs)/O
        total += 2.0 * np.prod(out, dtype=float) * np.prod(rhs, dtype=float) / rhs[-1]
    # stablehlo.dot_general ... contracting_dims = [a] x [b] ... (lhs, rhs) -> out
    for m in re.finditer(
            r"stablehlo\.dot_general.*?contracting_dims = \[([\d, ]*)\] x "
            r"\[[\d, ]*\].*?tensor<([\dx]*x?\w+)>.*?tensor<[\dx]*x?\w+>\)"
            r" -> tensor<([\dx]*x?\w+)>", text):
        lc, lhs_s, out_s = m.groups()
        lhs = _dims(lhs_s.rsplit("x", 1)[0]) if "x" in lhs_s else []
        out = _dims(out_s.rsplit("x", 1)[0]) if "x" in out_s else []
        lcd = [int(x) for x in lc.split(",") if x.strip()]
        k = np.prod([lhs[i] for i in lcd], dtype=float) if lhs else 1.0
        total += 2.0 * np.prod(out, dtype=float) * k
    return total


def matmul_flops(fn, *args, **kwargs) -> float:
    """Conv + dot_general flops of one call of `fn` (trace-only)."""
    import jax

    spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x, (args, kwargs))
    args, kwargs = spec
    text = jax.jit(fn).lower(*args, **kwargs).as_text()
    return stablehlo_matmul_flops(text)


@contextlib.contextmanager
def _attention_tally():
    """Patch the pallas attention entry points to tally analytic flops
    during a trace (and skip the actual pallas_call — the tally only needs
    shapes, and skipping keeps CPU traces interpret-free)."""
    import jax.numpy as jnp

    from mvoc_tpu.ops import attention as A

    tally = {"flops": 0.0}
    orig_flash, orig_frame = A.flash_attention, A.frame_attention

    def flash_patch(q, k, v, *a, **kw):
        b, h, sq, d = q.shape
        sk = k.shape[2]
        tally["flops"] += 4.0 * b * h * sq * sk * d
        return jnp.zeros_like(q)

    def frame_patch(q, k, v, f, heads, bias, **kw):
        if q.ndim == 4:
            b, _, s, inner = q.shape
        else:
            s, _, inner = q.shape
            b = 1
        d = inner // heads
        tally["flops"] += 4.0 * b * heads * s * f * f * d
        return jnp.zeros_like(q)

    A.flash_attention, A.frame_attention = flash_patch, frame_patch
    try:
        yield tally
    finally:
        A.flash_attention, A.frame_attention = orig_flash, orig_frame


def _eqn_dot_flops(eqn) -> float:
    (lc, _), _ = eqn.params["dimension_numbers"]
    lhs = eqn.invars[0].aval.shape
    out = eqn.outvars[0].aval.shape
    k = np.prod([lhs[i] for i in lc], dtype=float) if lhs else 1.0
    return 2.0 * np.prod(out, dtype=float) * k


def _eqn_conv_flops(eqn) -> float:
    dn = eqn.params["dimension_numbers"]
    rhs = eqn.invars[1].aval.shape
    out = eqn.outvars[0].aval.shape
    g = eqn.params.get("feature_group_count", 1)
    out_ch_axis = dn.rhs_spec[0]  # rhs_spec = (O, I, *spatial) axis indices
    contraction = np.prod(rhs, dtype=float) / rhs[out_ch_axis] / g
    return 2.0 * np.prod(out, dtype=float) * contraction


def jaxpr_matmul_flops(fn, *args, **kwargs) -> float:
    """Matmul-class flops of one call of `fn`, counted by walking the
    jaxpr: `scan` bodies multiply by trip count, `pallas_call` kernel
    bodies multiply by grid size (so the flash/frame attention kernels'
    in-kernel dot_generals are counted exactly, padding included),
    `cond`/`switch` take the most expensive branch, `while` bodies count
    once (none of the bench programs hide matmuls in unbounded whiles).

    This is the honest replacement for XLA's `cost_analysis()["flops"]`,
    which counts loop bodies once and pallas custom-calls as zero."""
    import jax

    spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x, (args, kwargs))
    args, kwargs = spec

    def walk(jaxpr) -> float:
        total = 0.0
        for eqn in jaxpr.eqns:
            prim = eqn.primitive.name
            if prim == "dot_general":
                total += _eqn_dot_flops(eqn)
            elif prim == "conv_general_dilated":
                total += _eqn_conv_flops(eqn)
            elif prim == "scan":
                total += eqn.params["length"] * walk(eqn.params["jaxpr"].jaxpr)
            elif prim == "while":
                total += walk(eqn.params["body_jaxpr"].jaxpr)
            elif prim == "cond":
                total += max(walk(b.jaxpr) for b in eqn.params["branches"])
            elif prim == "pallas_call":
                inner = eqn.params["jaxpr"]
                inner = getattr(inner, "jaxpr", inner)
                gm = eqn.params.get("grid_mapping")
                grid = np.prod(gm.grid, dtype=float) if gm is not None and gm.grid else 1.0
                total += grid * walk(inner)
            else:
                # recurse into any nested jaxprs (pjit, closed_call, remat,
                # custom_jvp/vjp, shard_map, checkpoint, ...)
                for v in eqn.params.values():
                    if hasattr(v, "jaxpr"):
                        total += walk(getattr(v, "jaxpr"))
                    elif hasattr(v, "eqns"):
                        total += walk(v)
        return total

    closed = jax.make_jaxpr(lambda *a, **k: fn(*a, **k))(*args, **kwargs)
    return walk(closed.jaxpr)


def jaxpr_matmul_flops_by_class(fn, *args, **kwargs) -> dict:
    """Like jaxpr_matmul_flops but split by op class:

      conv    lax.conv_general_dilated (XLA conv emitter)
      dot     dot_general OUTSIDE pallas kernels (FF/projections +
              matmul-form convs, ops/conv.py)
      pallas  dot_generals INSIDE pallas kernels x grid (the attention
              kernels; any future pallas GEMMs land here too)

    The per-class totals sum to jaxpr_matmul_flops — the roofline budget
    (scripts/roofline_budget.py) divides each class's measured device time
    by these to get achieved TF/s per class."""
    import jax

    spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x, (args, kwargs))
    args, kwargs = spec

    def walk(jaxpr, out, in_pallas):
        for eqn in jaxpr.eqns:
            prim = eqn.primitive.name
            if prim == "dot_general":
                out["pallas" if in_pallas else "dot"] += _eqn_dot_flops(eqn)
            elif prim == "conv_general_dilated":
                out["conv"] += _eqn_conv_flops(eqn)
            elif prim == "scan":
                inner = {"conv": 0.0, "dot": 0.0, "pallas": 0.0}
                walk(eqn.params["jaxpr"].jaxpr, inner, in_pallas)
                for k in out:
                    out[k] += eqn.params["length"] * inner[k]
            elif prim == "while":
                walk(eqn.params["body_jaxpr"].jaxpr, out, in_pallas)
            elif prim == "cond":
                branches = []
                for b in eqn.params["branches"]:
                    inner = {"conv": 0.0, "dot": 0.0, "pallas": 0.0}
                    walk(b.jaxpr, inner, in_pallas)
                    branches.append(inner)
                best = max(branches, key=lambda d: sum(d.values()))
                for k in out:
                    out[k] += best[k]
            elif prim == "pallas_call":
                inner_j = eqn.params["jaxpr"]
                inner_j = getattr(inner_j, "jaxpr", inner_j)
                gm = eqn.params.get("grid_mapping")
                grid = (np.prod(gm.grid, dtype=float)
                        if gm is not None and gm.grid else 1.0)
                inner = {"conv": 0.0, "dot": 0.0, "pallas": 0.0}
                walk(inner_j, inner, True)
                for k in out:
                    out[k] += grid * inner[k]
            else:
                for v in eqn.params.values():
                    if hasattr(v, "jaxpr"):
                        walk(getattr(v, "jaxpr"), out, in_pallas)
                    elif hasattr(v, "eqns"):
                        walk(v, out, in_pallas)

    closed = jax.make_jaxpr(lambda *a, **k: fn(*a, **k))(*args, **kwargs)
    out = {"conv": 0.0, "dot": 0.0, "pallas": 0.0}
    walk(closed.jaxpr, out, False)
    return out


def forward_flops(fn, *args, **kwargs) -> float:
    """Total matmul-class flops (conv + dot + attention) of one call of
    `fn` — for single forwards without internal scans.

    One trace with the pallas entry points tallied-and-stubbed: wherever
    the dispatch picks the pallas kernels (TPU) the tally counts them;
    wherever it picks the XLA einsum path (CPU) the StableHLO walk counts
    the same matmuls as dot_generals.  Either way the total is the same —
    pinned by tests/test_flops.py."""
    import jax

    spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "shape") else x, (args, kwargs))
    args, kwargs = spec
    with _attention_tally() as tally:
        # a fresh jit so the patched trace can't be served from (or poison)
        # the real function's jit cache
        text = jax.jit(lambda *a, **k: fn(*a, **k)).lower(
            *args, **kwargs).as_text()
    return stablehlo_matmul_flops(text) + tally["flops"]
