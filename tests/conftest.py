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

# Build the native runtime if missing or stale (the .so is not checked into
# git; `make -C native` is the canonical build).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_REPO, "guacamole_tpu", "runtime", "libguac_runtime.so")
_NATIVE = os.path.join(_REPO, "native")


def _native_stale() -> bool:
    if not os.path.exists(_SO):
        return True
    so_mtime = os.path.getmtime(_SO)
    for fn in os.listdir(_NATIVE):
        if fn.endswith((".cpp", ".h", ".hpp")):
            if os.path.getmtime(os.path.join(_NATIVE, fn)) > so_mtime:
                return True
    return False


if _native_stale():
    import subprocess

    subprocess.run(["make", "-C", _NATIVE], check=True, capture_output=True)

REFERENCE_RESOURCES = "/root/reference/src/test/resources"


@pytest.fixture(scope="session")
def resources_dir():
    if not os.path.isdir(REFERENCE_RESOURCES):
        pytest.skip("reference test resources not available")
    return REFERENCE_RESOURCES


def resource_path(name: str) -> str:
    return os.path.join(REFERENCE_RESOURCES, name)
