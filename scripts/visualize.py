#!/usr/bin/env python
"""Roll a trained policy and report its return (reference
scripts/visualize.py:20-62: load actor + obs_rms from a checkpoint
artifact, run one episode, print the return).

    python scripts/visualize.py algo=pql task=Cartpole \\
        artifact=runs/<run>/best_model num_envs=16 episodes=3

There is no on-screen viewer on a headless TPU pod; "visualization" is a
batched deterministic rollout with per-episode statistics (the reference
also just prints the reward when run headless, visualize.py:57-59).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pql_tpu.cfg import Config, parse_cli

from pql_tpu.utils import enable_compilation_cache

enable_compilation_cache()
from pql_tpu.envs import make_env
from pql_tpu.utils.checkpoint import load_model_snapshot, restore_into_state
from pql_tpu.utils.evaluator import Evaluator


def main(argv: list[str]) -> None:
    episodes = 1
    rest = []
    for arg in argv:
        if arg.startswith("episodes="):
            episodes = int(arg.split("=", 1)[1])
        else:
            rest.append(arg)
    cfg = parse_cli(rest, base=Config(num_envs=16, eval_num_envs=16))
    if not cfg.artifact:
        raise SystemExit("pass artifact=<path to a saved model snapshot>")

    from pql_tpu.algos import get_algo
    from pql_tpu.algos.pql import PQL

    env = make_env(cfg)
    agent = (
        PQL(cfg) if cfg.algo.name == "PQL" else get_algo(cfg.algo.name)(cfg, env)
    )
    state = agent.init(jax.random.PRNGKey(cfg.seed))
    state = restore_into_state(state, load_model_snapshot(cfg.artifact))

    actor_params = state.params if hasattr(state, "params") else state.actor_params
    evaluator = Evaluator(cfg, env, agent.eval_actor_apply)
    rng = jax.random.PRNGKey(cfg.seed + 1)
    for ep in range(episodes):
        rng, k = jax.random.split(rng)
        metrics = evaluator.eval_policy(actor_params, state.obs_rms, k)
        print(
            f"episode batch {ep}: return={metrics['eval/return']:.2f} "
            f"length={metrics['eval/episode_length']:.1f}"
        )


if __name__ == "__main__":
    main(sys.argv[1:])
