"""Global test configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4 item 9): sharding and
collective logic is validated without TPU hardware; the driver separately
compile-checks the multi-chip path via ``__graft_entry__.dryrun_multichip``.

Must run before jax initializes a backend, hence the env mangling at import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon sitecustomize re-exports JAX_PLATFORMS=axon; override at runtime.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

from gpflow_tpu.utilities.shapes import set_enable_check_shapes

# Runtime shape contracts are ON for the whole suite (the reference enables
# check_shapes the same way, ref tests/conftest.py:41-57). Under jit the
# checks run once at trace time, so the suite-wide cost is negligible.
set_enable_check_shapes(True)


@pytest.fixture
def rng() -> np.random.RandomState:
    return np.random.RandomState(0)
