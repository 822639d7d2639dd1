#!/usr/bin/env python
"""Warm the persistent XLA compile cache for bench.py's operating points.

Builds the EXACT agent configs bench.py measures (same make_config kwargs
→ same traced program → same cache key) and compiles init/warmup/
train_block once each, without running a measurement window. Run this
after a machine re-image so the driver's round-end `python bench.py`
hits a warm cache instead of burning its per-config deadline on cold
compiles (the round-2/3 post-mortem failure mode).

Usage: python -u scripts/warm_bench_cache.py [config_key ...]
Default: the two compile-heavy configs (ant_pql_4096, allegro_pql_8192).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pql_tpu.utils import enable_compilation_cache

enable_compilation_cache()

# mirror bench.py's _pql kwargs exactly (TPU path: bf16, ipc=16)
CONFIGS = {
    "cartpole_pql_4096": ("Cartpole", 4096, {}),
    "cartpole_pql_1024": ("Cartpole", 1024, {}),
    "ant_pql_4096": ("Ant", 4096, {}),
    "allegro_pql_8192": ("AllegroHand", 8192, {}),
    "allegro_pqld_16384": (
        "AllegroHand",
        16384,
        {
            "algo__distl": True,
            "algo__cri_class": "DoubleQ",
            "algo__memory_size": 2_000_000,
        },
    ),
}


def warm(key: str) -> None:
    from pql_tpu.algos.pql import PQL
    from pql_tpu.cfg import make_config

    task, num_envs, extra = CONFIGS[key]
    cfg = make_config(
        "pql",
        task=task,
        num_envs=num_envs,
        logging__mode="off",
        algo__compute_dtype="bfloat16",
        algo__iters_per_call=16,
        **extra,
    )
    t0 = time.time()
    agent = PQL(cfg)
    state = agent.init(jax.random.PRNGKey(0))
    print(f"[{key}] init done {time.time() - t0:.0f}s", flush=True)
    state, _ = agent.warmup(state)
    print(f"[{key}] warmup done {time.time() - t0:.0f}s", flush=True)
    state, m = agent.train_block(state)
    jax.block_until_ready(m)
    print(f"[{key}] train_block compiled {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    # default: every compile-heavy TPU config bench.py runs, INCLUDING
    # allegro_pqld_16384 — the heaviest compile (16384 envs + C51 DoubleQ)
    # and the config most likely to get a clamped leash on a cold cache
    keys = sys.argv[1:] or [
        "cartpole_pql_4096",
        "cartpole_pql_1024",
        "ant_pql_4096",
        "allegro_pql_8192",
        "allegro_pqld_16384",
    ]
    for k in keys:
        warm(k)
