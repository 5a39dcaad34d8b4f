"""Test config: force CPU with 8 virtual devices so multi-chip sharding paths
run without TPU hardware (SURVEY.md §4 'Implication for the rebuild')."""

import os

# Force CPU even when the surrounding environment points JAX at a TPU
# (JAX_PLATFORMS=axon etc.) — unit tests must be hermetic and hardware-free.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def tiny_cfg():
    from dlsg_tpu.config import tiny_test_config

    return tiny_test_config()
