"""Test configuration: force JAX onto an 8-device virtual CPU mesh.

Must run before the first `import jax` anywhere in the test session so the
platform flags take effect. Multi-device tests then use
`jax.devices()` (8 CPU devices) to exercise pjit/shard_map collectives
without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
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
