"""Test configuration: run on CPU with 8 virtual devices (multi-chip sharding
tests without hardware) and x64 enabled (verification precision parity with the
reference's Eigen/Ceres doubles).

Note: this environment pre-registers an 'axon' TPU PJRT plugin via sitecustomize
and forces platform selection, so the env-var route (JAX_PLATFORMS=cpu) is not
enough — we must override through jax.config AFTER the jax import."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules: a process that
    accumulates 150+ XLA:CPU compilations reproducibly SEGFAULTS inside
    backend_compile (observed round 4 at the same suite position across
    runs; xdist workers reduced but did not eliminate it in slow mode).
    Modules rarely share compiled programs, so the cost is small."""
    yield
    jax.clear_caches()
