"""Test configuration.

All tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware. The sandbox's axon sitecustomize both
pre-imports jax and overrides jax_platforms, so plain env vars are not
enough: set XLA_FLAGS before backends initialize AND force the platform
through jax.config.
"""

import os
import pathlib

_BACKEND = os.environ.get("GORDER_TPU_TEST_BACKEND", "cpu")
if _BACKEND == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
# any other value (e.g. GORDER_TPU_TEST_BACKEND=native) leaves the
# environment's platform untouched so the suite exercises real hardware

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
