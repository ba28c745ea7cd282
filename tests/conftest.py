"""Test harness: force CPU with 8 virtual devices so sharding tests run
without TPU hardware, before jax initializes."""

import os

# Force CPU even when the shell exports JAX_PLATFORMS=axon/tpu: unit tests
# must not depend on (slow, tunneled) TPU hardware.  Set SH_TPU_TESTS=1 to
# run the suite on the real device instead.
if not os.environ.get("SH_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(2038074761)  # the reference CQF seed
