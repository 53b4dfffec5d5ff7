"""Test env: force the CPU backend with 8 virtual devices for mesh tests.

The environment presets JAX_PLATFORMS=axon (tunneled TPU); tests must be
hermetic and fast, so we override to CPU via jax.config (the env var is
ignored once the axon plugin is registered). Must run before any test
module imports jax-dependent code.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
