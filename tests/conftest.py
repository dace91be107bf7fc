"""Test configuration: force JAX onto CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (the TPU-world
equivalent of multi-node CI testing).

Note: this container's sitecustomize pre-imports jax and programmatically
pins the platform list to the remote-TPU tunnel ("axon"), so neither
JAX_PLATFORMS=cpu nor setdefault works — we must override jax.config after
import and before first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
