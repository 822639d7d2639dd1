#!/usr/bin/env python
"""Update-ratio sweep driver.

The reference's feedback controller adapts critic:sim and critic:actor
update ratios toward configured targets at runtime (reference
scripts/train_pql.py:127-158, pql_algo.yaml:17-18). In the fused TPU
design the ratios are exact static integers compiled into the step, so
"adapting" them means RE-JITTING with new ratio arguments — cheap with
the persistent compilation cache. This driver sweeps ratio points
(BASELINE config 4: "AllegroHand PQL, 8192 envs, actor/critic
update-ratio sweep") and reports, per point:

- env-steps/s (throughput cost of heavier learner phases),
- critic/actor updates per second,
- the train-return learning slope over the window,
- final train + eval return.

Usage:
    python scripts/ratio_sweep.py task=AllegroHand num_envs=8192 \
        sweep=8:2,4:2,16:2,8:4,2:1 seconds_per_point=240 \
        out=runs/ratio_sweep_allegro.json

Any other key=value pairs are forwarded to the normal config CLI.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pql_tpu.cfg import parse_cli
from pql_tpu.utils import enable_compilation_cache

enable_compilation_cache()

from pql_tpu.envs import make_eval_env
from pql_tpu.utils.evaluator import Evaluator


def run_point(cfg, critic_sample_ratio: int, critic_actor_ratio: int, seconds: float) -> dict:
    from pql_tpu.algos.pql import PQL

    cfg.algo.critic_sample_ratio = critic_sample_ratio
    cfg.algo.critic_actor_ratio = critic_actor_ratio
    agent = PQL(cfg)  # re-jit with the new static ratios
    state = agent.init(jax.random.PRNGKey(cfg.seed))
    state, _ = agent.warmup(state)

    # compile + settle
    state, metrics = agent.train_block(state)
    jax.block_until_ready(metrics["train/return"])

    returns: list[tuple[float, float]] = []  # (t, train_return)
    t0 = time.perf_counter()
    steps0 = int(state.env_steps)
    # snapshot update counters alongside steps0 so all three rates are
    # deltas over the same timed window (warm-up/settle excluded)
    cri0, act0 = int(state.critic_update_count), int(state.actor_update_count)
    while time.perf_counter() - t0 < seconds:
        state, metrics = agent.train_block(state)
        returns.append((time.perf_counter() - t0, float(metrics["train/return"])))
    dt = time.perf_counter() - t0
    steps = int(state.env_steps) - steps0

    evaluator = Evaluator(cfg, make_eval_env(cfg), agent.eval_actor_apply)
    eval_metrics = evaluator.eval_policy(
        state.actor_params, state.obs_rms, jax.random.PRNGKey(1)
    )

    # learning slope: least-squares fit of train_return over the window
    slope = 0.0
    if len(returns) >= 2:
        import numpy as np

        t = np.array([r[0] for r in returns])
        y = np.array([r[1] for r in returns])
        slope = float(np.polyfit(t, y, 1)[0])

    return {
        "critic_sample_ratio": critic_sample_ratio,
        "critic_actor_ratio": critic_actor_ratio,
        "seconds": round(dt, 1),
        "env_steps_per_s": round(steps / dt, 1),
        "critic_updates_per_s": round((int(state.critic_update_count) - cri0) / dt, 1),
        "actor_updates_per_s": round((int(state.actor_update_count) - act0) / dt, 1),
        "train_return_final": returns[-1][1] if returns else None,
        "train_return_slope_per_s": round(slope, 4),
        "eval_return": float(eval_metrics["eval/return"]),
    }


def main(argv: list[str]) -> None:
    sweep = "8:2,4:2,16:2,8:4,8:1"
    seconds = 240.0
    out = None
    rest = []
    for a in argv:
        if a.startswith("sweep="):
            sweep = a.split("=", 1)[1]
        elif a.startswith("seconds_per_point="):
            seconds = float(a.split("=", 1)[1])
        elif a.startswith("out="):
            out = a.split("=", 1)[1]
        else:
            rest.append(a)
    cfg = parse_cli(rest)
    cfg.logging.mode = "off"

    points = []
    for spec in sweep.split(","):
        cs, ca = spec.split(":")
        points.append((int(cs), int(ca)))

    results = []
    for cs, ca in points:
        print(f"--- ratio point critic:sim={cs} critic:actor={ca} ---", flush=True)
        r = run_point(cfg, cs, ca, seconds)
        print(json.dumps(r), flush=True)
        results.append(r)

    table = {
        "task": cfg.task,
        "num_envs": cfg.num_envs,
        "batch_size": cfg.algo.batch_size,
        "seconds_per_point": seconds,
        "points": results,
    }
    if out:
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        with open(out, "w") as f:
            json.dump(table, f, indent=2)
        print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
