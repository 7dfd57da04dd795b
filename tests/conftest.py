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


@pytest.fixture()
def rng():
    # function-scoped: every test gets the same fresh stream, so test data
    # never depends on suite composition or execution order (a session-
    # scoped generator made thresholds drift as tests were added)
    return np.random.default_rng(0)
