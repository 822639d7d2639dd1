#!/usr/bin/env python
"""Dev perf probe: time the fused PQL step per-phase on a task.

Usage: python -u scripts/perf_probe.py [task] [num_envs] [iters_per_call]

Times the full fused step, then variants with the critic/actor phases
stripped (by overriding n_critic/n_actor on the agent before jit build),
attributing ms/iter to sim vs critic vs actor phases without a profiler.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pql_tpu.algos.pql import PQL
from pql_tpu.cfg import make_config

from pql_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def build(task, num_envs, ipc, n_critic=None, n_actor=None, sample_slots=None,
          prefetch=False):
    over = {} if sample_slots is None else {"algo__sample_slots": sample_slots}
    if prefetch:
        over["algo__prefetch_batches"] = True
    cfg = make_config(
        "pql",
        task=task,
        num_envs=num_envs,
        logging__mode="off",
        algo__compute_dtype="bfloat16",
        algo__iters_per_call=ipc,
        **over,
    )
    agent = PQL.__new__(PQL)
    # rebuild with phase overrides: mimic PQL.__init__ but patch counts
    PQL.__init__(agent, cfg)
    if n_critic is not None or n_actor is not None:
        if n_critic is not None:
            agent.n_critic = n_critic
        if n_actor is not None:
            agent.n_actor = n_actor
        agent._build_jitted()
    return agent


def time_agent(agent, calls=20):
    state = agent.init(jax.random.PRNGKey(0))
    state, _ = agent.warmup(state)
    for _ in range(2):
        state, m = agent.train_block(state)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(calls):
        state, m = agent.train_block(state)
    jax.block_until_ready(m)
    dt = time.perf_counter() - t0
    return dt / (calls * agent.iters_per_call) * 1e3


def main():
    task = sys.argv[1] if len(sys.argv) > 1 else "Ant"
    num_envs = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    ipc = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    sample_slots = int(sys.argv[4]) if len(sys.argv) > 4 and sys.argv[4] else None
    # optional 5th arg: 1 = also time algo.prefetch_batches variants
    probe_prefetch = len(sys.argv) > 5 and sys.argv[5] == "1"

    rows = {}
    variants = [
        ("full", None, None, False),
        ("sim_only", 0, 0, False),
        ("sim+critic", None, 0, False),
    ]
    if probe_prefetch:
        variants += [("full+prefetch", None, None, True)]
    for name, nc, na, pf in variants:
        t0 = time.perf_counter()
        agent = build(task, num_envs, ipc, n_critic=nc, n_actor=na,
                      sample_slots=sample_slots, prefetch=pf)
        ms = time_agent(agent)
        rows[name] = ms
        print(
            f"{name:12s} {ms:8.3f} ms/iter  (compile+run {time.perf_counter() - t0:.0f}s)",
            flush=True,
        )

    sim = rows["sim_only"]
    critic = rows["sim+critic"] - sim
    actor = rows["full"] - rows["sim+critic"]
    print(f"attributed: sim {sim:.3f} | critic {critic:.3f} | actor {actor:.3f} ms/iter")
    print(f"throughput: {num_envs / (rows['full'] * 1e-3):,.0f} env-steps/s @ {num_envs} envs")


if __name__ == "__main__":
    main()
