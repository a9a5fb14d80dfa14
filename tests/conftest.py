"""Test harness config: run everything on CPU with 8 virtual devices so
sharding tests exercise multi-chip code paths without a pod (the JAX analog
of a fake multi-node backend; see SURVEY.md §4.5).

NOTE: plugins (jaxtyping) import jax before this conftest runs, so the env
vars alone are not enough — we also force the platform through jax.config,
which works any time before backend initialization.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.devices()[0].platform == "cpu", "tests must run on CPU"
    assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
