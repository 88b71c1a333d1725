"""Test harness: run everything on CPU with 8 virtual devices.

Multi-device sharding tests run against a fake 8-device CPU mesh (the standard
JAX trick — SURVEY.md §4); real-TPU benchmarking lives in bench.py, not here.
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize pre-imports jax and pins the hardware TPU
# platform; the env var alone is too late, so force the config directly.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: slow integration tests")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
