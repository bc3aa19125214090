"""Test env: force CPU backend with 8 virtual devices (the JAX-standard
fake-multichip mechanism; SURVEY §4) before any test imports jax.

NOTE: the environment pins JAX_PLATFORMS=axon (TPU tunnel) and the axon
plugin overrides the env var at import; both env vars AND a post-import
config update are needed to reliably land on CPU.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
