"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (SURVEY.md §4 "multi-node testing"):
CPU gives native f64 (the reference's primary scalar type) and lets
distributed-parity tests exercise real multi-device shardings without TPU
hardware.

Note: this environment injects a ``sitecustomize`` that imports jax and
registers the TPU ("axon") plugin in every interpreter, so mutating
``JAX_PLATFORMS`` here is too late — the backend choice must go through
``jax.config`` (safe: backends initialise lazily on first use).
``XLA_FLAGS`` is still read at backend init, so the forced device count can
be set via the environment.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices("cpu")
