"""Test configuration: force an 8-device virtual CPU mesh so all sharding /
collective logic is exercised without TPU hardware (SURVEY.md §4).

Note: this environment pre-imports jax with JAX_PLATFORMS=axon (one real TPU
chip through a tunnel), so env vars are too late — the platform must be
forced through jax.config before the first backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# VIVID_TPU_TESTS=1 keeps the real backend for tests/test_tpu_kernels.py
# (opt-in chip validation); everything else runs on the virtual CPU mesh.
if os.environ.get("VIVID_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end test")


def pytest_ignore_collect(collection_path, config):
    # Under the real-chip flag, only the TPU kernel tests make sense: the
    # rest of the suite needs the 8-device CPU mesh (and would crawl through
    # tunnel compiles on one chip).
    if os.environ.get("VIVID_TPU_TESTS") == "1":
        p = str(collection_path)
        return p.endswith(".py") and not p.endswith("test_tpu_kernels.py")
    return None
