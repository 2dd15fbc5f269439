"""On-TPU test suite — run in its OWN pytest invocation.

The main tests/ conftest pins jax to the CPU platform before anything else
imports jax (required for the 8-virtual-device mesh tests), which makes a
real-TPU test impossible in the same process.  This directory deliberately
has no platform pin: `python -m pytest tests_tpu -q` on a machine with a
TPU runs the compiled-kernel parity gates; anywhere else every test
auto-skips (see the skipif marks).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
