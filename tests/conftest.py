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
