"""Test configuration: force CPU with a virtual 8-device mesh.

TPU/distributed tests run without hardware by faking devices on the host
(SURVEY.md section 4 item 4): sharding and collective paths are exercised on
8 virtual CPU devices via ``xla_force_host_platform_device_count``.
Must run before the first jax import in the test process.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

# The axon TPU plugin (sitecustomize) force-sets jax_platforms via config at
# interpreter start, which wins over the env var — override it back to CPU
# before any backend initializes.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1111)
