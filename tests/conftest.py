"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding paths are validated on host CPU devices
(xla_force_host_platform_device_count), per the project testing strategy.
"""

import os

# SEEKR_TPU_TEST_BACKEND=tpu runs the suite against the real device (slow
# first compiles); default is the 8-device virtual CPU mesh.
_USE_TPU = os.environ.get("SEEKR_TPU_TEST_BACKEND", "").lower() == "tpu"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # the session may export axon/tpu
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize (TPU tunnel) overrides jax_platforms via jax.config
# at interpreter start; env alone is not enough — override the config back
# before any backend initializes.
import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/seekr/tests/data")
HERE = pathlib.Path(__file__).parent


@pytest.fixture(scope="session")
def ref_data():
    """Reference repo test fixtures (goldens) if present, else skip."""
    if not REFERENCE_DATA.exists():
        pytest.skip("reference fixtures not available")
    return REFERENCE_DATA


@pytest.fixture(scope="session")
def example_fa(ref_data):
    return str(ref_data / "example.fa")
