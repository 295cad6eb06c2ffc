"""Test configuration.

Tests run on CPU jax with 8 virtual devices so sharding tests exercise a
real multi-device mesh without TPU hardware (the driver separately
dry-runs the multi-chip path).  Must run before jax is imported anywhere.
"""

import os

# NOTE: this machine's site config pins JAX_PLATFORMS to the TPU plugin, so
# the env var alone is not enough -- use jax.config before backend init.
# NR_TEST_TPU=1 (the hardware tier, tests/test_tpu_hardware.py) keeps the
# real backend instead.
_ON_TPU = bool(os.environ.get("NR_TEST_TPU"))
if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
# persistent compilation cache keeps repeat runs fast
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(os.path.dirname(__file__), ".jax_cache")
)

import jax

if not _ON_TPU:
    jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/tests_torch/data")


@pytest.fixture(scope="session")
def reference_data():
    """Golden assets from the reference checkout (read-only).  Skip
    gracefully when the reference isn't mounted."""
    if not REFERENCE_DATA.exists():
        pytest.skip("reference golden data not available")
    return REFERENCE_DATA
