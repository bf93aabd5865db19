"""Test harness: force an 8-device CPU mesh so multi-chip pjit paths run
without TPU hardware (the JAX-idiomatic 'cluster on one host' mechanism)."""
import os

# Must be set before jax is imported anywhere in the test process. The
# environment pre-sets JAX_PLATFORMS=axon (the tunnelled TPU); tests must be
# hermetic and multi-device, so force-override to CPU. Clearing
# PALLAS_AXON_POOL_IPS also skips the sitecustomize TPU-relay registration,
# which otherwise serializes every python process on the single TPU claim.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
