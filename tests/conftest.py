"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in this environment, so sharding /
pjit paths are validated on `xla_force_host_platform_device_count=8` CPU
devices (SURVEY.md §4 recommended strategy). Env vars must be set before the
first jax import anywhere in the process, hence the top-of-conftest placement.
"""

import os
import sys

# NOTE: this environment pre-imports jax and registers the TPU-tunnel ("axon")
# backend from sitecustomize in EVERY python process, with JAX_PLATFORMS=axon
# exported — so env-var defaults are too late / ignored. XLA_FLAGS is still
# honored (parsed at first CPU-client creation), and the platform choice must
# be flipped via jax.config BEFORE any backend is touched.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs
