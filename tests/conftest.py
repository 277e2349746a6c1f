"""Test harness: force CPU with 8 virtual devices so sharding tests run
anywhere (the TPU analog of a fake distributed backend, which the reference
lacked — SURVEY.md §4). Must run before jax is imported."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# NOTE: the axon TPU plugin in this image ignores the JAX_PLATFORMS env var;
# only jax.config.update("jax_platforms", ...) reliably forces CPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
