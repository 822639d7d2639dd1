#!/usr/bin/env python
"""Benchmark: training throughput at the reference operating points.

Covers every BASELINE.json config that fits one chip (the driver runs
this single-chip; multi-host variants of configs 4-5 are exercised by
tests/test_multihost.py and __graft_entry__.dryrun_multichip):

1. Cartpole DDPG,  16 envs   (reference train_baselines.py path)
2. Cartpole PQL,   1024 envs
3. Cartpole PQL,   4096 envs (headline — round-over-round continuity)
4. Ant PQL,        4096 envs
5. AllegroHand PQL, 8192 envs
6. AllegroHand PQL-D, 16384 envs (distributional critic)

Prints ONE JSON line: the headline metric (flagship fused PQL step at
4096 envs: sim + 8 critic + 4 actor updates per env-step, batch 8192 —
reference pql_algo.yaml) plus an ``extra`` dict with every other config's
env-steps/s. vs_baseline is against the driver north-star of 5M aggregate
env-steps/s (BASELINE.json); the reference repo publishes no throughput
numbers (BASELINE.md).

Budget: stops starting new configs once PQL_BENCH_BUDGET_S (default 2400)
elapses — compile time on a cold cache dominates, and a partial report
beats a timeout kill. Skipped configs are reported as such, never
silently dropped.
"""

from __future__ import annotations

import json
import os
import time
import traceback

import jax

from pql_tpu.cfg import make_config
from pql_tpu.utils import enable_compilation_cache

enable_compilation_cache()

NORTH_STAR_STEPS_PER_S = 5_000_000.0
BUDGET_S = float(os.environ.get("PQL_BENCH_BUDGET_S", 2400))
T_START = time.perf_counter()


def _measure(agent, calls: int) -> float:
    """env-steps/s of agent.train_block (or train_iter) after burn-in."""
    state = agent.init(jax.random.PRNGKey(agent.cfg.seed))
    state, _ = agent.warmup(state)
    step_fn = getattr(agent, "train_block", agent.train_iter)
    iters_per_call = getattr(agent, "iters_per_call", 1)
    for _ in range(3):
        state, metrics = step_fn(state)
    jax.block_until_ready(metrics)
    t0 = time.perf_counter()
    for _ in range(calls):
        state, metrics = step_fn(state)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0
    iters = calls * iters_per_call
    return iters * agent.cfg.algo.horizon_len * agent.cfg.num_envs / dt


def _pql(task: str, num_envs: int, calls: int, **algo_kw) -> float:
    from pql_tpu.algos.pql import PQL

    cfg = make_config(
        "pql",
        task=task,
        num_envs=num_envs,
        logging__mode="off",
        # TPU-tuned operating point: bf16 network compute (params stay
        # fp32) and 16 fused iterations per dispatch
        algo__compute_dtype="bfloat16",
        algo__iters_per_call=16,
        **algo_kw,
    )
    return _measure(PQL(cfg), calls)


def _ddpg(task: str, num_envs: int, calls: int) -> float:
    from pql_tpu.algos import get_algo
    from pql_tpu.envs import make_env

    cfg = make_config(
        "ddpg",
        task=task,
        num_envs=num_envs,
        algo__batch_size=min(8192, num_envs * 64),
        algo__memory_size=1_000_000,
        logging__mode="off",
    )
    return _measure(get_algo("DDPG")(cfg, make_env(cfg)), calls)


CONFIGS = [
    # (key, thunk) — headline first so it always lands within budget
    ("cartpole_pql_4096", lambda: _pql("Cartpole", 4096, calls=50)),
    ("cartpole_ddpg_16", lambda: _ddpg("Cartpole", 16, calls=200)),
    ("cartpole_pql_1024", lambda: _pql("Cartpole", 1024, calls=50)),
    ("ant_pql_4096", lambda: _pql("Ant", 4096, calls=40)),
    ("allegro_pql_8192", lambda: _pql("AllegroHand", 8192, calls=20)),
    (
        "allegro_pqld_16384",
        lambda: _pql(
            "AllegroHand", 16384, calls=10,
            algo__distl=True, algo__cri_class="DoubleQ",
            algo__memory_size=2_000_000,
        ),
    ),
]


def main() -> None:
    extra: dict[str, object] = {}
    for key, thunk in CONFIGS:
        if key != "cartpole_pql_4096" and time.perf_counter() - T_START > BUDGET_S:
            extra[key] = "skipped_budget"
            continue
        try:
            extra[key] = round(thunk(), 1)
        except Exception:  # noqa: BLE001 — a failing config must not hide the rest
            extra[key] = "error: " + traceback.format_exc(limit=1).splitlines()[-1][:200]

    headline = extra.pop("cartpole_pql_4096")
    value = headline if isinstance(headline, float) else -1.0
    print(
        json.dumps(
            {
                "metric": "pql_env_steps_per_s",
                "value": value,
                "unit": "env_steps/s",
                "vs_baseline": round(value / NORTH_STAR_STEPS_PER_S, 4),
                "extra": extra,
            }
        )
    )


if __name__ == "__main__":
    main()
