"""Test fixtures: run everything on a virtual 8-device CPU mesh.

Sharding/collective tests need real multi-device code paths without TPU
hardware. NOTE: this image's site hook (axon) imports jax at interpreter
startup with JAX_PLATFORMS=axon, so setting the env var here is too late —
the platform must be forced through jax.config. XLA_FLAGS still works
because the CPU client initializes lazily.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: the suite re-jits the same task/agent
# programs across many test files, and the scalar-unrolled physics
# substep is compile-heavy (tens of seconds per rigid-body task on CPU).
# Caching executables across test files AND across suite runs cuts
# repeat wall-clock by an order of magnitude.
jax.config.update("jax_compilation_cache_dir", "/tmp/pql_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.device_count() >= 8, "tests require the virtual 8-device CPU mesh"


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
