"""Test configuration: force the JAX CPU backend with 8 virtual devices so
the sharding/parallel tests exercise a multi-device mesh without TPU
hardware (the strategy recommended in SURVEY §4)."""

import os

os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _seed():
    np.random.seed(42)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
