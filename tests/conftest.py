"""Test harness config: run the whole suite on a virtual 8-device CPU mesh.

Real TPU hardware (single chip) is exercised by bench.py / __graft_entry__.py;
tests validate numerics and sharding logic on host CPU with 8 virtual devices
so multi-chip pjit paths compile and execute under CI.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
