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
