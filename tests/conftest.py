"""Test configuration: force a virtual 8-device CPU mesh so every test —
including multi-chip sharding logic — runs on any host (SURVEY.md §4).

Note: this environment's sitecustomize imports jax at interpreter start (the
axon TPU plugin), so JAX_PLATFORMS env tweaks are too late here; the supported
path is jax.config.update before first backend use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # best effort for subprocesses

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
