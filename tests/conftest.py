"""Test harness config: run the whole suite on a virtual 8-device CPU mesh.

Real TPU hardware (single chip) is exercised by bench.py / __graft_entry__.py;
tests validate numerics and sharding logic on host CPU with 8 virtual devices
so multi-chip pjit paths compile and execute under CI.

NOTE: this image preimports jax at interpreter startup with
JAX_PLATFORMS=axon (remote TPU tunnel), so env vars set here are too late —
we must go through jax.config.  Backends initialize lazily, so flipping the
config before any device use still works.
"""

import os

# XLA_FLAGS is read by the CPU client at backend-init time (lazy), so this
# still takes effect as long as no jax computation ran yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # single-core CI box: multi-threaded eigen across 8 virtual devices
    # thrashes, and full XLA optimization costs ~100s/compile for the tiny
    # UNet. opt level 0 compiles 5x faster with near-identical runtime at
    # test shapes (numerics unaffected — tests compare against torch).
    os.environ["XLA_FLAGS"] = (
        flags
        + " --xla_force_host_platform_device_count=8"
        + " --xla_cpu_multi_thread_eigen=false"
        + " --xla_backend_optimization_level=0"
    ).strip()

# The full suite accumulates >65k mmap'd XLA JIT code regions in one
# process; the kernel default vm.max_map_count=65530 then makes the
# XLA:CPU compiler segfault near the end of the run.  Raise it (root on
# the CI box; silently skip elsewhere).
try:  # pragma: no cover
    with open("/proc/sys/vm/max_map_count", "r+") as _f:
        if int(_f.read()) < 1_000_000:
            _f.seek(0)
            _f.write("2000000")
except OSError:
    pass

import jax  # noqa: E402 (may already be preimported — that's fine)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

assert jax.devices()[0].platform == "cpu", "tests must run on host CPU"
assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
