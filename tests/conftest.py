"""Test harness config: force an 8-device virtual CPU mesh + x64.

Must run before any jax import in the test process. The axon TPU
plugin's sitecustomize registers itself regardless of JAX_PLATFORMS, so
we also flip the config flag explicitly.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["KMERTOOLS_QUIET"] = "1"
# small device batches keep CPU-backend test runtime low
os.environ.setdefault("KMERTOOLS_TARGET_CODES", str(1 << 16))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference/test_data")


@pytest.fixture
def test_data():
    return REFERENCE
