"""Test config: force CPU with 8 virtual devices so multi-chip sharding paths
run hermetically without TPU hardware (SURVEY.md §4).

The surrounding environment registers a remote-TPU (axon) PJRT plugin from a
sitecustomize hook at interpreter startup, so env vars alone are too late; but
JAX backends initialize lazily, so flipping `jax_platforms` to cpu (and setting
XLA_FLAGS) before the first device use is sufficient — and it makes the suite
~100x faster than remote-TPU compiles."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def tiny_cfg():
    from dlsg_tpu.config import tiny_test_config

    return tiny_test_config()
