"""Worker for the multi-process CPU test (tests/test_multihost.py).

Each OS process owns 4 virtual CPU devices and joins a 2-process
jax.distributed job — the laptop-scale stand-in for one-process-per-host
on a TPU pod (SURVEY §2.8 DP row). It then runs the SAME fused PQL
program as single-process training, over the global 8-device mesh, and
prints digest values of the resulting (replicated) parameters.

Run: python tests/mp_pql_worker.py <coordinator> <num_processes> <process_id> [task]

``task`` defaults to PointMass; passing Ant exercises a full rigid-body
state pytree (joint-space carries, contact buffers) across the process
boundary at toy shapes.
"""

import hashlib
import json
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=4").strip()
if "xla_cpu_collective_timeout_seconds" not in flags:
    # see tests/conftest.py — 1-core boxes starve rendezvous threads
    flags += " --xla_cpu_collective_timeout_seconds=1200"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # threefry_partitionable off — see conftest.py
jax.config.update("jax_compilation_cache_dir", "/tmp/pql_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    task = sys.argv[4] if len(sys.argv) > 4 else "PointMass"
    os.environ["PQL_COORDINATOR"] = coordinator
    os.environ["PQL_NUM_PROCESSES"] = str(nproc)
    os.environ["PQL_PROCESS_ID"] = str(pid)

    from pql_tpu.parallel import host_barrier, initialize, replicate

    assert initialize(None), "expected a multi-process job"
    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc, jax.devices()

    import numpy as np

    from pql_tpu.algos.pql import PQL
    from pql_tpu.cfg import make_config

    cfg = make_config(
        "pql",
        task=task,
        num_envs=16,
        algo__batch_size=64,
        algo__memory_size=4096,
        algo__warm_up=4,
        algo__horizon_len=1,
        logging__mode="off",
    )
    agent = PQL(cfg)  # default mesh: all 8 global devices
    key = replicate(jax.random.PRNGKey(3), agent.mesh)
    # AOT-compile every program, THEN barrier, THEN dispatch: gloo builds a
    # fresh communicator per executable with a ~30 s deadline at first
    # dispatch, so per-process compile skew (minutes for scalar-physics
    # tasks) must be absorbed by a host-side barrier, not the collective
    # itself — see pql_tpu/parallel/distributed.py host_barrier.
    init_c = agent.init.lower(key).compile()
    state_shape = jax.eval_shape(agent.init, key)
    warm_c = agent.warmup.lower(state_shape).compile()
    train_c = agent.train_iter.lower(state_shape).compile()
    host_barrier("mp_worker_compiled")
    state = init_c(key)
    state, _ = warm_c(state)
    for _ in range(2):
        state, _ = train_c(state)

    actor = np.asarray(state.actor_params)  # replicated flat param vector
    out = {
        "process": pid,
        "n_processes": jax.process_count(),
        "n_devices": jax.device_count(),
        "actor_sha": hashlib.sha256(actor.tobytes()).hexdigest(),
        "actor_sum": float(actor.sum()),
        "rms_mean_sum": float(np.asarray(state.obs_rms.mean).sum()),
        "env_steps": int(state.env_steps),
        "critic_updates": int(state.critic_update_count),
    }
    print("MPRESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
