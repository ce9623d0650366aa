"""Test configuration.

Tests run on CPU with a forced 8-virtual-device topology so sharding tests
exercise real GSPMD partitioning without TPU pods, and with x64 enabled for
the geodesy modules (which need float64 for cm-level assertions).

Must run before the first `import jax` anywhere in the test session.
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS=axon (the tunneled
# TPU), but unit tests must be hermetic, float64-capable, and multi-device.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Some pytest plugin may import jax before this conftest; the config update
# still wins as long as no backend has been initialized yet.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
