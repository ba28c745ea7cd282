"""Test harness: force CPU with 8 virtual devices.

The axon sitecustomize (/root/.axon_site) imports jax at interpreter
startup, so JAX_PLATFORMS env tweaks here are too late — jax snapshots env
config at import.  Updating the live config still works because no backend
has been initialized yet.  Set SH_TPU_TESTS=1 to run on the real device.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if not os.environ.get("SH_TPU_TESTS"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(2038074761)  # the reference CQF seed
