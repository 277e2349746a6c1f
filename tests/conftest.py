"""Test harness: force CPU with 8 virtual devices so sharding tests run
anywhere (the TPU analog of a fake distributed backend, which the reference
lacked — SURVEY.md §4). Must run before jax is imported."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell may preset a TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
