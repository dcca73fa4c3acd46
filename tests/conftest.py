"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
initializes any backend, so multi-chip sharding tests run anywhere
(SURVEY.md §4).

Note: this environment's sitecustomize registers an 'axon' TPU plugin and
programmatically sets jax_platforms="axon,cpu", which overrides the
JAX_PLATFORMS env var — so we must update jax.config here, after import but
before first backend use.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# exact fp32 matmuls so differential tests against the torch reference hold
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
