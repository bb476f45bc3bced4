"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices so that multi-chip
sharding (mesh/shard_map) is exercised without TPU hardware, mirroring how
the driver dry-runs ``__graft_entry__.dryrun_multichip``.
"""

import os

# force CPU (the ambient environment may pin JAX_PLATFORMS to a TPU plugin);
# set CONVEXADAM_TEST_PLATFORM to override (e.g. to run the suite on TPU).
os.environ["JAX_PLATFORMS"] = os.environ.get("CONVEXADAM_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
