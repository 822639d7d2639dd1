#!/usr/bin/env python
"""Benchmark: fused PQL training throughput at the reference operating point.

Runs the flagship fused PQL step (sim + 8 critic updates + 4 actor updates
per env-step, batch 8192 — reference pql/cfg/algo/pql_algo.yaml) at
num_envs=4096 on whatever devices are available, and prints ONE JSON line:

    {"metric": "pql_env_steps_per_s", "value": ..., "unit": "env_steps/s",
     "vs_baseline": ...}

vs_baseline is measured against the driver north-star of 5M aggregate
env-steps/s on a v5p slice (/root/repo/BASELINE.json); the reference repo
itself publishes no throughput numbers (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax

from pql_tpu.algos.pql import PQL
from pql_tpu.cfg import make_config

from pql_tpu.utils import enable_compilation_cache

enable_compilation_cache()

NORTH_STAR_STEPS_PER_S = 5_000_000.0


def main() -> None:
    cfg = make_config(
        "pql",
        task="Cartpole",
        num_envs=4096,
        logging__mode="off",
        # TPU-tuned operating point: bf16 network compute (params stay
        # fp32) and 16 fused iterations per dispatch
        algo__compute_dtype="bfloat16",
        algo__iters_per_call=16,
    )
    agent = PQL(cfg)
    state = agent.init(jax.random.PRNGKey(cfg.seed))
    state, _ = agent.warmup(state)

    # burn-in (compile + cache warm)
    for _ in range(3):
        state, metrics = agent.train_block(state)
    jax.block_until_ready(metrics)

    calls = 50
    t0 = time.perf_counter()
    for _ in range(calls):
        state, metrics = agent.train_block(state)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    iters = calls * agent.iters_per_call
    steps_per_s = iters * cfg.algo.horizon_len * cfg.num_envs / dt
    print(
        json.dumps(
            {
                "metric": "pql_env_steps_per_s",
                "value": round(steps_per_s, 1),
                "unit": "env_steps/s",
                "vs_baseline": round(steps_per_s / NORTH_STAR_STEPS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
