"""Test session setup.

Forces JAX onto a virtual 8-device CPU mesh *before* jax is imported anywhere,
so sharding/collective tests run on any machine (the reference has no
multi-device testing at all; this is the fake-cluster layer SURVEY.md §4 calls
for).  Benchmarks (bench.py) do NOT import this and run on real TPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The machine image may pre-register an accelerator backend (and pin
# JAX_PLATFORMS) via sitecustomize; the config update below overrides it so
# the test suite always runs on the virtual 8-device CPU mesh.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_DATA_DIR = pathlib.Path("/root/reference/tests/data")
LOCAL_DATA_DIR = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def test_data_dir() -> pathlib.Path:
    """Synthetic chr22 corpus (VCF + FASTA + BED + samples)."""
    if LOCAL_DATA_DIR.exists():
        return LOCAL_DATA_DIR
    if REFERENCE_DATA_DIR.exists():
        return REFERENCE_DATA_DIR
    pytest.skip("no test data corpus available")


@pytest.fixture()
def output_dir(tmp_path) -> str:
    return str(tmp_path)
