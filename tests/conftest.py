"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the standard JAX recipe for testing multi-chip sharding without TPU
hardware (SURVEY.md §4): XLA_FLAGS=--xla_force_host_platform_device_count=8.
Must run before jax is imported anywhere.
"""
import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins axon (TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize imports jax at interpreter start, which latches the
# platform from the session env (JAX_PLATFORMS=axon -> real TPU) before this
# file runs; the env assignment above is then ignored. config.update still
# works because the backend itself is not initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

# Compile-heavy tests (full train-step grads on the 8-device mesh) drop
# from minutes to seconds on re-runs with the persistent XLA cache.
from ampis_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

REFERENCE = Path("/root/reference")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: compile-heavy test (full-model jit); deselect with "
        "-m 'not slow' for the fast profile")


@pytest.fixture(scope="session")
def reference_root():
    if not REFERENCE.exists():
        pytest.skip("reference tree not available")
    return REFERENCE
