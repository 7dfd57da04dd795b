"""Test configuration: force JAX onto an 8-device virtual CPU mesh.

The environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests must run
locally on CPU with 8 virtual devices so pjit/shard_map collectives are
exercised without hardware.  Env mutation alone is not honored (an axon
sitecustomize re-exports it), so we also set the platform through
jax.config before any device is touched.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, not the TPU tunnel")
    assert len(jax.devices()) == 8


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
