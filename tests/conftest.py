"""Test configuration.

All tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (set before JAX is imported anywhere).
"""

import os
import pathlib

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the sandbox presets 'axon'
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

REFERENCE = pathlib.Path("/root/reference")
FIXTURES = REFERENCE / "tests" / "files"


@pytest.fixture(scope="session")
def fixtures():
    if not FIXTURES.is_dir():
        pytest.skip("reference fixture corpus not available")
    return FIXTURES


def requires_fixtures(func):
    return pytest.mark.skipif(
        not FIXTURES.is_dir(), reason="reference fixture corpus not available"
    )(func)
