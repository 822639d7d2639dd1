"""Jitted policy evaluation.

The reference spawns a separate OS process with its own simulator and ships
pickled policies over a pipe (reference pql/utils/evaluator.py:14-121). On
TPU the evaluator is simply another jitted program time-multiplexed onto
the same chips: a fresh eval-env batch is rolled for one full episode
horizon with the deterministic policy, and per-episode returns/lengths are
tracked exactly like default_rollout (evaluator.py:63-106).
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

from pql_tpu.envs.base import VecEnv
from pql_tpu.utils.trackers import Tracker


class Evaluator:
    def __init__(self, cfg, env: VecEnv, actor_apply: Callable):
        """actor_apply(actor_params, normalized_obs) -> deterministic action.

        Visual agents set ``actor_apply.needs_env_state = True`` and
        receive the env state as a third argument (to render camera /
        pointcloud observations from physics state)."""
        self.cfg = cfg
        self.env = env
        self.actor_apply = actor_apply
        self._needs_env_state = bool(getattr(actor_apply, "needs_env_state", False))
        self._rollout = jax.jit(self._rollout_impl)
        self.start_time = time.time()

    def _rollout_impl(self, actor_params, obs_rms, rng):
        env = self.env
        rng, k_reset = jax.random.split(rng)
        env_state, obs = env.reset(k_reset)
        ret_tracker = Tracker.create(env.num_envs)
        len_tracker = Tracker.create(env.num_envs)

        def step(carry, key):
            env_state, obs, cur_ret, cur_len, ret_tr, len_tr = carry
            obs_n = obs_rms.normalize(obs) if self.cfg.algo.obs_norm else obs
            if self._needs_env_state:
                action = self.actor_apply(actor_params, obs_n, env_state)
            else:
                action = self.actor_apply(actor_params, obs_n)
            env_state, next_obs, reward, done, info = env.step(env_state, action, key)
            cur_ret = cur_ret + reward
            cur_len = cur_len + 1.0
            done_mask = done > 0.5
            ret_tr = ret_tr.update(cur_ret, done_mask)
            len_tr = len_tr.update(cur_len, done_mask)
            cur_ret = jnp.where(done_mask, 0.0, cur_ret)
            cur_len = jnp.where(done_mask, 0.0, cur_len)
            return (env_state, next_obs, cur_ret, cur_len, ret_tr, len_tr), None

        zeros = jnp.zeros(env.num_envs, jnp.float32)
        carry = (env_state, obs, zeros, zeros, ret_tracker, len_tracker)
        keys = jax.random.split(rng, env.max_episode_length)
        carry, _ = jax.lax.scan(step, carry, keys)
        _, _, _, _, ret_tr, len_tr = carry
        return {"eval/return": ret_tr.mean(), "eval/episode_length": len_tr.mean()}

    def eval_policy(self, actor_params, obs_rms, rng) -> dict[str, float]:
        metrics = self._rollout(actor_params, obs_rms, rng)
        return {k: float(v) for k, v in metrics.items()}

    # -- overlapped evaluation (reference runs eval in its own process with
    # its own sim, pql/utils/evaluator.py:14-29, so the train loop never
    # waits; the single-chip analog is ASYNC DISPATCH: queue the jitted
    # rollout now, keep training, and only materialize the floats at the
    # NEXT eval event — the host never blocks on the eval execution)

    def eval_policy_async(self, actor_params, obs_rms, rng):
        """Dispatch the eval rollout without blocking; returns an opaque
        handle of device futures for ``resolve``."""
        return self._rollout(actor_params, obs_rms, rng)

    @staticmethod
    def resolve(handle) -> dict[str, float]:
        """Materialize a handle from ``eval_policy_async`` (blocks only if
        the rollout hasn't finished on-device yet)."""
        return {k: float(v) for k, v in handle.items()}

    def check_if_should_stop(self, step: int | None = None) -> bool:
        """Stop on max_step if set, else wall-clock budget
        (reference evaluator.py:34-38)."""
        if self.cfg.max_step is not None:
            return step is not None and step > self.cfg.max_step
        return (time.time() - self.start_time) > self.cfg.max_time
