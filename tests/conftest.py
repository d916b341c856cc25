"""Test harness: hermetic CPU backend with 8 virtual devices.

Mirrors the reference's differential-testing strategy (SURVEY.md §4) with the
multi-device simulation the reference never needed: all tests run on a virtual
8-device CPU mesh so sharded == single-device can be asserted bit-exactly.
Must set env vars before jax is imported anywhere.
"""

import os

# Force CPU: the surrounding environment may pin JAX_PLATFORMS to a real TPU
# backend (axon tunnel); tests must be hermetic and multi-device.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# A sitecustomize may have already registered a TPU plugin AND set the
# jax_platforms *config* (which wins over the env var) at interpreter start;
# override the config as well, before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) >= 8, jax.devices()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1177)  # eprint 2019/1177
