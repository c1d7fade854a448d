"""Test configuration: run on a virtual 8-device CPU mesh with x64.

Tests never require TPU hardware; multi-chip sharding is validated on
XLA's forced host-platform device count, per the framework's test strategy
(SURVEY.md section 4).

Note: the harness environment pins JAX_PLATFORMS=axon (a TPU tunnel) and a
sitecustomize imports jax before pytest loads this file, so env vars are
already baked -- we must use jax.config.update, which works any time before
backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # belt and braces for subprocesses

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
