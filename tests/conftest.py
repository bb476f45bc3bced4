"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices so that multi-chip
sharding (mesh/shard_map) is exercised without TPU hardware, mirroring how
the driver dry-runs ``__graft_entry__.dryrun_multichip``.
"""

import os

# force CPU (the ambient environment may pin JAX_PLATFORMS to a TPU plugin);
# set CONVEXADAM_TEST_PLATFORM=axon to run the suite on the real chip
# (the TPU plugin's platform name is "axon", not "tpu").
_platform = os.environ.get("CONVEXADAM_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the ambient axon TPU plugin's sitecustomize calls
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start,
# overriding the env var — force it back before any backend initializes.
jax.config.update("jax_platforms", _platform)

if _platform != "cpu":
    # on-chip suite runs pay 30s+ remote compiles per program — persist them
    from convexadam_tpu.utils.cache import enable_compilation_cache  # noqa: E402

    enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng(request):
    # function-scoped and seeded per test name (stable across processes —
    # builtin hash() is salted): every test sees the same draws regardless
    # of which other tests ran before it (a session-scoped stream made
    # tolerances silently order-dependent)
    import zlib

    return np.random.default_rng(zlib.crc32(request.node.name.encode()))
