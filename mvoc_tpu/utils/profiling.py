"""Profiling + structured run logging (first-class, SURVEY.md §5).

The reference's observability is a tqdm bar and stray time.time() prints
(reference: pipeline_i2vgen_xl.py:1989-1995).  Here:
  * `trace(dir)` — context manager around jax.profiler for TensorBoard
    traces of any pipeline stage;
  * `StepTimer` — wall-clock per-stage timing with a JSON summary;
  * `save_run_config` — snapshot the fully-merged config next to outputs so
    every run is reproducible from its artifacts.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Any

logger = logging.getLogger("mvoc_tpu.profiling")


@contextlib.contextmanager
def trace(trace_dir: str | None):
    """jax.profiler trace if a directory is given, else no-op."""
    if not trace_dir:
        yield
        return
    import jax

    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield
    logger.info("wrote profiler trace to %s", trace_dir)


class StepTimer:
    """Accumulates named wall-clock stage timings."""

    def __init__(self):
        self.records: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.records[name] = self.records.get(name, 0.0) + dt
            logger.info("[timing] %s: %.3fs", name, dt)

    def summary(self) -> dict[str, float]:
        return dict(self.records)

    def dump(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


def device_op_breakdown(trace_dir: str, top: int = 25) -> dict[str, Any]:
    """Parse the newest perfetto trace under `trace_dir` into a device-op
    time breakdown: totals by HLO category and by UNet module, plus the top
    leaf ops.  Parent rows (the XLA-module lane, `jit_*`, `while*`) are
    excluded so nested ops are not double-counted.

    Returns {"total_s", "by_category", "by_module", "top_ops"}; use with
    `trace(...)` around a few steps to see where a step's device time goes.
    """
    import glob
    import gzip
    from collections import defaultdict

    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no *.trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace_json = json.load(f)
    events = trace_json.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "Chip" in n}
    if not dev_pids:  # CPU traces: no device lane naming — use every lane
        dev_pids = set(pid_names)

    cat, mod, ops = defaultdict(float), defaultdict(float), defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids or "dur" not in e:
            continue
        n = e.get("name", "?")
        if n.startswith("while") or n.startswith("jit_"):
            continue  # parent rows enclose the leaf ops counted below
        args = e.get("args", {})
        cat[args.get("hlo_category", "?")] += e["dur"]
        ops[n] += e["dur"]
        total += e["dur"]
        tf_op = args.get("tf_op", "")
        if "I2VGenXLUNet/" in tf_op:
            mod[tf_op.split("I2VGenXLUNet/", 1)[1].split("/")[0]] += e["dur"]
        else:
            mod["(outside unet)"] += e["dur"]
    us = 1e6
    return {
        "trace": path,
        "total_s": round(total / us, 4),
        "by_category": {k: round(v / us, 4) for k, v in
                        sorted(cat.items(), key=lambda kv: -kv[1])},
        "by_module": {k: round(v / us, 4) for k, v in
                      sorted(mod.items(), key=lambda kv: -kv[1])},
        "top_ops": {k: round(v / us, 4) for k, v in
                    sorted(ops.items(), key=lambda kv: -kv[1])[:top]},
    }


def save_run_config(config: Any, out_dir: str, name: str = "run_config.yaml") -> str:
    from mvoc_tpu import config as cfglib

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, name)
    with open(path, "w") as f:
        if hasattr(config, "_data"):
            f.write(cfglib.to_yaml(config))
        else:
            json.dump(config, f, indent=2, default=str)
    return path
