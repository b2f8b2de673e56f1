"""Test configuration: run on a virtual 8-device CPU mesh in float64.

Correctness tests need f64 (the reference's oracle tolerances are 1e-5..1e-8,
`/root/reference/test/correctness.jl:33-35`) and multi-device sharding tests
need more than one device; both are available on CPU via XLA flags. TPU
execution is exercised by `bench.py`, not the unit suite.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the remote-TPU ("axon") platform
# and forces jax_platforms onto it; the config update below (before any
# backend is initialized) wins and pins the suite to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """The full 175-test suite accumulates enough in-process XLA state that
    one late reverse-mode compile segfaults the CPU backend (reproducible at
    tests/test_solution.py::test_grad_through_dense_output_exact_hits only
    when the WHOLE suite runs in one process; any subset passes). Dropping
    the jit/executable caches at module boundaries keeps the compiler state
    small and sidesteps the crash; per-module recompiles cost little since
    configs rarely repeat across modules."""
    yield
    jax.clear_caches()
