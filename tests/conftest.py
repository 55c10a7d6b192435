"""Test configuration: force an 8-device CPU mesh before JAX backends init.

Multi-chip sharding paths are exercised on virtual CPU devices
(xla_force_host_platform_device_count), per the TPU-native test strategy —
real TPU runs happen in bench.py / the driver's dryrun.

NOTE: this environment auto-imports jax at interpreter startup, so
JAX_PLATFORMS env vars set here are too late for jax's import-time config
default; jax.config.update still works because backends initialize lazily.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on CPU, got {}".format(jax.default_backend()))
assert len(jax.devices()) >= 8, (
    "expected 8 virtual CPU devices, got {}".format(len(jax.devices())))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
