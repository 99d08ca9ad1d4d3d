"""Test configuration: force CPU with 8 virtual devices.

Sharding tests need a multi-device mesh; real multi-chip hardware is not
available in CI, so we emulate 8 devices on the host CPU (the standard JAX
pattern for testing pjit/shard_map programs).

The container's sitecustomize registers a remote-compile TPU backend at
interpreter start and pins JAX_PLATFORMS=axon; ``jax.config.update`` after
import is the reliable way to route tests to CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE_TESTS = pathlib.Path("/root/reference/tests")


@pytest.fixture(scope="session")
def fixtures_dir() -> pathlib.Path:
    if not REFERENCE_TESTS.exists():
        pytest.skip("reference fixture directory not available")
    return REFERENCE_TESTS
