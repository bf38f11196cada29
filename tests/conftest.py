"""Test harness: force an 8-device virtual CPU mesh so sharding paths are
exercised without TPU hardware (SURVEY.md §4 implication (d)/(e)).

NOTE: jax may already be imported at interpreter startup (sitecustomize on
TPU-tunnel hosts), so env vars alone are too late — use jax.config, which
takes effect as long as no backend has been initialised yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# f64 available for finite-difference oracles; library code pins f32/bf16.
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound compiled-program accumulation across the suite.

    A full-suite run holds hundreds of compiled XLA:CPU executables in one
    process; at that heap state the LARGE 1024-pose solver compile
    (test_solver_scale soak) segfaulted inside backend_compile_and_load —
    reproducibly at the same test, while the same test passes in isolation
    and in any small module combination.  Clearing jax's caches between
    modules keeps the compiler's working state bounded; modules mostly
    compile module-local programs, so the rerun cost is small."""
    yield
    jax.clear_caches()
