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


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight tier (pipeline parity, multiprocess, e2e "
        "trainings).  Excluded from the default run; `--runslow` runs "
        "everything, `-m slow` runs only this tier.")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the slow tier too (full suite)")


def pytest_collection_modifyitems(config, items):
    # the default `pytest tests/` run is the sub-10-minute tier; any
    # explicit -m expression (e.g. `-m slow`, `-m "not slow"`) takes over
    if config.getoption("--runslow") or config.getoption("-m"):
        return
    skip = pytest.mark.skip(reason="slow tier: pass --runslow or -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


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
