"""Test config: run everything on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# Force CPU: the ambient environment pins JAX to the tunneled TPU ("axon"),
# which is slow per-dispatch and single-chip; tests want the virtual
# 8-device CPU mesh.  The axon site hook overrides env vars, so set the jax
# config directly too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE_DATA = pathlib.Path("/root/reference/data")


@pytest.fixture(scope="session")
def reference_data():
    if not REFERENCE_DATA.exists():
        pytest.skip("reference data not mounted")
    return REFERENCE_DATA


@pytest.fixture(scope="session")
def configs_dir():
    return pathlib.Path(__file__).resolve().parent.parent / "configs"
