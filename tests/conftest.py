"""Test configuration: force a virtual 8-device CPU JAX backend.

Multi-chip sharding is validated on a simulated mesh exactly as SURVEY.md §4
prescribes (the reference could only validate concurrency by running real
threads; we can simulate a pod slice on CPU).

Note: the surrounding environment may set JAX_PLATFORMS=axon (a tunneled
real TPU) and pre-import jax, so plain env-var setdefault is not enough —
we must update the live jax config before the backend initializes.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE_DATA = pathlib.Path("/root/reference/data")


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU backend; jax backend was "
        f"initialized to {jax.default_backend()} before conftest could "
        "force cpu"
    )
    assert len(jax.devices()) == 8


@pytest.fixture(scope="session")
def small_t7_fastq():
    path = REFERENCE_DATA / "small_t7.1000.fastq"
    if not path.exists():
        pytest.skip("reference data not available")
    return path


@pytest.fixture(scope="session")
def small_t7_golden():
    path = REFERENCE_DATA / "small_t7.1000.fastq.14.count"
    if not path.exists():
        pytest.skip("reference golden file not available")
    return path
