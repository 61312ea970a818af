"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; all sharding tests run on
virtual CPU devices and Pallas kernels run in interpreter mode
(ops.runtime.interpret_mode keys off the backend). The environment may
preload jaxlib with a TPU platform plugin before conftest runs, so we use
explicit jax.config updates (which beat the captured JAX_PLATFORMS env var)
rather than os.environ.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # best-effort for late spawns

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
