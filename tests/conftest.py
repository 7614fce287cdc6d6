"""Test configuration.

Forces JAX onto a virtual 8-device CPU mesh so multi-chip sharding code paths
are exercised without TPU hardware. Must run before any jax import.
"""

import os

# Force CPU even though the ambient environment points JAX at the TPU
# (JAX_PLATFORMS=axon, latched by sitecustomize before this file runs):
# tests must be fast and hardware-independent. jax.config.update still works
# because no backend has been initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_RESOURCES = "/root/reference/src/test/resources"


@pytest.fixture(scope="session")
def resources_dir():
    if not os.path.isdir(REFERENCE_RESOURCES):
        pytest.skip("reference test resources not available")
    return REFERENCE_RESOURCES


def resource_path(name: str) -> str:
    return os.path.join(REFERENCE_RESOURCES, name)
