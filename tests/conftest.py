"""Test configuration: run everything on a virtual 8-device CPU mesh.

The TPU answer to "test multi-device without a cluster": force the host
platform and fake 8 devices, so sharding/collective paths compile and run
hermetically in CI (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# A host plugin may have forced jax_platforms to "axon,cpu" (tunneled TPU)
# before this conftest runs; tests must be hermetic on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: reruns skip XLA compiles entirely.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
