"""Test configuration: force an 8-device virtual CPU platform.

All tests run on CPU with 8 virtual XLA devices so multi-chip sharding
(`Mesh(('data','model'))`) is exercised without real TPU hardware, mirroring
the driver's `dryrun_multichip` environment.

Note: this image pre-registers a TPU PJRT plugin via sitecustomize and pins
JAX_PLATFORMS=axon, so env vars alone don't stick — we must override through
`jax.config` before the backend initializes.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
