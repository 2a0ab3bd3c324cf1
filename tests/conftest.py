"""Test config: force an 8-device virtual CPU mesh BEFORE jax imports.

This is the JAX-native "fake backend" for multi-chip tests without a cluster
(SURVEY.md §4): sharding/collective code paths run on 8 host CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# Determinism + keep test compiles fast.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu";
# override back to CPU-only for tests. Must happen before any backend use.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.RandomState(0)
