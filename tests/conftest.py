"""Test session setup: force an 8-device virtual CPU platform.

Must run before the first ``import jax`` anywhere in the test process, so the
env mutation lives at module import time. This makes multi-chip sharding
(mesh + shard_map + collectives) testable without TPU hardware, per the
strategy in SURVEY §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-sets jax_platforms="axon,cpu" via jax.config
# (overriding the env var), which would silently run "CPU" tests on the real
# TPU chip. Pin the config back to cpu before any backend is initialised.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]
