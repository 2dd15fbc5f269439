import os

# Force CPU with 8 virtual devices so multi-chip sharding is exercised
# without TPU hardware.  NOTE: the JAX_PLATFORMS env var is ignored by this
# environment's jax build (a TPU platform plugin overrides it) — the config
# update below is what actually pins the platform.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# The XLA:CPU backend segfaults inside backend_compile_and_load after a few
# hundred tests' worth of accumulated live executables in one process
# (reproducible at the same test index across runs; the same test passes in
# any shorter invocation).  Dropping executable references periodically
# keeps the client well below the crash point; the handful of re-compiles
# this forces costs a few seconds over the whole suite.
_TESTS_PER_CACHE_CLEAR = 75
_test_counter = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_clear_caches():
    yield
    _test_counter["n"] += 1
    if _test_counter["n"] % _TESTS_PER_CACHE_CLEAR == 0:
        jax.clear_caches()
