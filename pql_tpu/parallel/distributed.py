"""Multi-host (multi-process) initialization and helpers.

The reference scales within ONE host: Ray pins the V/P learners to other
GPUs of the same machine and ships tensors through the object store
(reference scripts/train_pql.py:29-51, pql/algo/pql_v_learner.py:21); there
is no NCCL/MPI/cross-host path anywhere in the repo (SURVEY §2.9). The
TPU-native scale-out is one *process per host* joined into a single SPMD
program by ``jax.distributed``:

- every process calls :func:`initialize` before the first backend query;
- ``jax.devices()`` then returns the devices of ALL processes, so
  :func:`pql_tpu.parallel.make_mesh` builds a global 1-D env mesh spanning
  hosts;
- the env axis (and with it replay shards and per-env carries) is laid out
  over that mesh; rms ``psum`` and grad ``pmean`` become ICI collectives
  within a slice and DCN collectives across slices — no code changes in
  the algorithms, the same `shard_map` program just runs wider;
- only process 0 logs/evaluates verbosely (``is_primary``).

On a real TPU pod slice ``jax.distributed.initialize()`` needs no
arguments — coordinator discovery comes from the TPU metadata. On
CPU/GPU (and in the multi-process CPU test, tests/test_multihost.py) the
coordinator address / process count / process id must be passed
explicitly, mirroring torchrun-style env vars.
"""

from __future__ import annotations

import os
from typing import Any

import jax


_ENV_COORD = "PQL_COORDINATOR"
_ENV_NPROC = "PQL_NUM_PROCESSES"
_ENV_PID = "PQL_PROCESS_ID"

# module-level record of a successful initialize() — paired with the
# public is_initialized() probe below so we never touch jax._src internals
_initialized_here = False


def _already_initialized() -> bool:
    """Detect a prior jax.distributed.initialize without private APIs."""
    is_init = getattr(jax.distributed, "is_initialized", None)
    if is_init is not None:  # public probe (jax >= 0.4.34)
        try:
            return bool(is_init())
        except Exception:
            pass
    return _initialized_here  # fallback for jax versions without the probe


def initialize(cfg=None) -> bool:
    """Join this process into the jax.distributed job if configured.

    Returns True when running multi-process. Safe to call when already
    initialized (no-op) or single-process (no-op). Must run before any
    jax backend query — scripts/train.py calls it first thing in main().

    Sources, in priority order:
    1. cfg.dist.* (coordinator_address / num_processes / process_id)
    2. PQL_COORDINATOR / PQL_NUM_PROCESSES / PQL_PROCESS_ID env vars
    3. cfg.dist.auto_tpu_pod: bare ``jax.distributed.initialize()`` for
       TPU-pod metadata discovery.
    """
    global _initialized_here
    d = getattr(cfg, "dist", None) if cfg is not None else None
    coord = (d and d.coordinator_address) or os.environ.get(_ENV_COORD)
    nproc = (d and d.num_processes) or os.environ.get(_ENV_NPROC)
    pid = os.environ.get(_ENV_PID) if (d is None or d.process_id is None) else d.process_id

    if _already_initialized():
        return jax.process_count() > 1

    if coord and nproc is not None:
        # cross-process CPU collectives need gloo (the multi-process CPU
        # test path; the setting only affects the CPU backend, so it is
        # harmless on TPU). NOTE: must not query jax.default_backend()
        # here — that would initialize the backend before initialize().
        if "cpu" in (jax.config.jax_platforms or "cpu"):
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid) if pid is not None else None,
        )
        _initialized_here = True
        return _post_init()
    if d is not None and getattr(d, "auto_tpu_pod", False):
        jax.distributed.initialize()  # TPU metadata discovery
        _initialized_here = True
        return _post_init()
    return False


def _post_init() -> bool:
    """Smoke-check cross-process collectives while processes are in
    lock-step (right after the jax.distributed handshake, where skew is
    milliseconds). NOTE this does NOT immunize later programs: XLA:CPU's
    gloo backend creates a FRESH communicator per executable, each with a
    hard ~30 s key-value-exchange deadline at its first dispatch — see
    :func:`host_barrier` for how heavyweight programs must handle it.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("pql_collective_context_warmup")
        return True
    return False


def host_barrier(name: str, timeout_s: float = 3600.0) -> None:
    """Coordination-service (host-side) barrier across processes.

    Why it exists: gloo (XLA:CPU's cross-process collective backend)
    builds a NEW communicator per compiled executable, and that build has
    a hard ~30 s key-value deadline at the executable's first dispatch
    (``make_gloo_tcp_collectives`` exposes no timeout knob). Trace+compile
    of a scalar-physics fused step takes minutes with per-process variance
    well over 30 s, so the faster process's communicator times out waiting
    for the slower one (observed: 2-process Ant on a 1-core box). The
    cure is to AOT-compile (``jitted.lower(args).compile()``) everything,
    host_barrier(), and only then dispatch — this barrier rides the
    coordination service (minutes-scale deadline, no device collective),
    so it tolerates arbitrary compile skew. TPU pods don't need this:
    their collectives are mesh-wired, not KV-negotiated.

    Uses the distributed client's ``wait_at_barrier`` (no public
    equivalent exists); degrades to a no-op if the private handle is
    unavailable.
    """
    if jax.process_count() <= 1:
        return
    client = getattr(
        getattr(getattr(jax, "_src", None), "distributed", None), "global_state", None
    )
    client = getattr(client, "client", None)
    if client is None:
        return
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def is_primary() -> bool:
    """True on the process that should own logging/eval-artifact IO."""
    return jax.process_index() == 0


def replicate(tree: Any, mesh) -> Any:
    """device_put a host-local pytree as fully-replicated global arrays on
    ``mesh`` — required in multi-process mode where jit inputs must be
    global arrays (every process passes the same host value, e.g. the same
    seed-derived PRNGKey)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
