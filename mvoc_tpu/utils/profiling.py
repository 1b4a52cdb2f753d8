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
