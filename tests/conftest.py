"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §4
test plan item (d)). Must run before the first ``import jax``."""

import os

# Hard override: the surrounding environment pins JAX_PLATFORMS to the real
# TPU ('axon'); tests always run on the virtual CPU mesh. A pytest plugin
# imports jax before this conftest, so setting env vars alone is not enough —
# jax.config still works because the backend is not initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.device_count() == 8, (
    "tests require the 8-device virtual CPU mesh; got "
    f"{jax.devices()}")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(42)


def pytest_collection_modifyitems(config, items):
    """Auto-mark the heavyweight end-to-end modules as 'slow' so future
    sessions can iterate with `pytest -m "not slow"` (~1 min) and run the
    full suite (~10 min) before committing."""
    slow_modules = {"test_cli_serve", "test_trainer", "test_recognition_ocr",
                    "test_recognition_training"}
    for item in items:
        if item.module.__name__ in slow_modules:
            item.add_marker(pytest.mark.slow)
