"""Test configuration: run everything on CPU with 8 virtual devices.

Multi-chip sharding tests use an 8-device host-platform mesh so they run anywhere;
the driver separately dry-run-compiles the multi-chip path via __graft_entry__.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

# The axon sitecustomize imports jax at interpreter start and pins
# jax_platforms to the TPU backend; env vars alone are too late here.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
