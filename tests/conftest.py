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
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_timeout_seconds" not in _flags:
    # The in-process CPU all-reduce rendezvous aborts the WHOLE process if
    # any of the 8 participant threads is starved too long (rendezvous.cc
    # termination timeout). On a 1-core CI box long training-loop tests
    # trip this; raise it far beyond any plausible scheduler stall.
    _flags += " --xla_cpu_collective_timeout_seconds=1200"
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: do NOT enable jax_threefry_partitionable here. Mesh-invariant RNG
# comes from explicit per-env fold_in(global index) (pql_tpu/ops/noise.py,
# envs/base.py env_keys), so partitionable threefry adds nothing — and on a
# 1-core box its repartitioned RNG collectives deadlock XLA:CPU's in-process
# rendezvous (~40 s hard abort in rendezvous.cc) in long training loops
# (reproduced 2026-08-17: 8-dev PQL aborts by iter ~50 with it on, runs
# clean with it off).

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
