"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware (SURVEY.md §4 item 7).

The axon TPU plugin registers itself via sitecustomize and overrides
JAX_PLATFORMS, so the env var alone is not enough — we must also flip the
config after import (before first backend use).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu" and len(devs) == 8
    return devs


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running parity/bench tests")
    config.addinivalue_line(
        "markers", "smoke: fast tier (<2 min single-core, no heavy jit) — "
        "run with `pytest -m smoke` for quick iteration")
