"""Synchronous DDPG with n-step replay and mixed exploration noise.

Re-implements the reference AgentDDPG (reference pql/algo/ddpg.py) — which
is "synchronous single-process PQL" — as three jitted pure functions over
one pytree state: ``explore`` (horizon env steps → n-step staging → replay
write), ``update`` (update_times × (TD critic step + DPG actor step +
polyak)), and their composition ``train_iter``. The replay buffer lives
inside the state, on device, instead of being a host-side object
(reference scripts/train_baselines.py:44-51).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from pql_tpu.algos import base
from pql_tpu.envs.base import VecEnv
from pql_tpu.ops import RunningMeanStd, soft_update
from pql_tpu.replay import (
    create_nstep,
    create_replay,
    nstep_scan,
    replay_add,
    replay_sample,
    replay_slots,
)
from pql_tpu.utils.trackers import EpisodeStats


@struct.dataclass
class OffPolicyState:
    """Everything the training loop carries, as one device-resident pytree."""

    actor_params: Any
    actor_opt: Any
    actor_target: Any
    critic_params: Any
    critic_opt: Any
    critic_target: Any
    obs_rms: RunningMeanStd
    env_state: Any
    obs: jax.Array
    nstep: Any
    replay: Any
    stats: EpisodeStats
    rng: jax.Array
    env_steps: jax.Array  # int64-ish counter (int32 fine for our horizons)
    update_count: jax.Array


class DDPG:
    """Factory that closes over (cfg, env, modules) and exposes jitted fns."""

    name = "DDPG"

    def __init__(self, cfg, env: VecEnv):
        self.cfg = cfg
        self.env = env
        (
            self.actor,
            self.critic,
            self._actor_params0,
            self._critic_params0,
            self.actor_tx,
            self.critic_tx,
            self._actor_opt0,
            self._critic_opt0,
        ) = base.init_actor_critic(cfg, env, jax.random.PRNGKey(cfg.seed))
        self.action_fn = base.exploration_policy(cfg, self.actor)
        self.explore = jax.jit(partial(self._explore), static_argnames=("random", "horizon"))
        self.update = jax.jit(self._update)

    # ---------------------------------------------------------------- init

    def init(self, rng) -> OffPolicyState:
        cfg, env = self.cfg, self.env
        k_env, k_loop = jax.random.split(rng)
        env_state, obs = env.reset(k_env)
        slots = replay_slots(cfg.algo.memory_size, env.num_envs, cfg.algo.horizon_len)
        replay = create_replay(
            slots=slots,
            num_envs=env.num_envs,
            obs_dim=env.obs_dim,
            action_dim=env.action_dim,
            obs_dtype=jnp.bfloat16 if cfg.algo.replay_dtype == "bfloat16" else jnp.float32,
            valid_start=cfg.algo.nstep - 1,
        )
        return OffPolicyState(
            actor_params=self._actor_params0,
            actor_opt=self._actor_opt0,
            actor_target=self._actor_params0,
            critic_params=self._critic_params0,
            critic_opt=self._critic_opt0,
            critic_target=self._critic_params0,
            obs_rms=RunningMeanStd.create((env.obs_dim,)),
            env_state=env_state,
            obs=obs,
            nstep=create_nstep(
                env.num_envs, env.obs_dim, env.action_dim, cfg.algo.nstep, cfg.algo.gamma
            ),
            replay=replay,
            stats=base.make_stats(cfg, env),
            rng=k_loop,
            env_steps=jnp.zeros((), jnp.int32),
            update_count=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------- explore

    def _explore(self, state: OffPolicyState, *, horizon: int, random: bool = False):
        """horizon env steps → n-step staging → ring write
        (reference ddpg.py:81-117 + train_baselines.py:49-56)."""
        cfg = self.cfg
        rng, k_roll = jax.random.split(state.rng)
        carry = base.RolloutCarry(
            env_state=state.env_state,
            obs=state.obs,
            obs_rms=state.obs_rms,
            stats=state.stats,
            rng=k_roll,
        )
        # iteration index for noise decay (cfg.algo.noise.decay); derived
        # from the step counter so it stays jit-pure and checkpointable
        iter_idx = state.env_steps // (cfg.algo.horizon_len * self.env.num_envs)
        carry, traj = base.rollout(
            self.env, cfg, self.action_fn, state.actor_params, carry, horizon, random,
            step=iter_idx,
        )
        nstep, emitted, _valid = nstep_scan(state.nstep, traj)
        # invalid warm-up emissions are excluded by the replay valid_start
        # watermark, so the write itself is unconditional (static shapes)
        replay = replay_add(state.replay, emitted)
        return state.replace(
            env_state=carry.env_state,
            obs=carry.obs,
            obs_rms=carry.obs_rms,
            stats=carry.stats,
            nstep=nstep,
            replay=replay,
            rng=rng,
            env_steps=state.env_steps + horizon * self.env.num_envs,
        )

    # -------------------------------------------------------------- update

    def _critic_loss_fn(self, critic_params, target_q, obs_n, action):
        q1, q2 = self.critic.apply(critic_params, obs_n, action)
        return jnp.mean(jnp.square(q1 - target_q)) + jnp.mean(jnp.square(q2 - target_q))

    def _actor_loss_fn(self, actor_params, critic_params, obs_n):
        action = self.actor.apply(actor_params, obs_n)
        q = self.critic.apply(critic_params, obs_n, action, method=type(self.critic).q_min)
        return -jnp.mean(q)

    def _one_update(self, state: OffPolicyState, rng):
        """One (critic TD + actor DPG + polyak) step (ddpg.py:119-166)."""
        cfg = self.cfg
        k_sample, k_tgt = jax.random.split(rng)
        batch = replay_sample(state.replay, k_sample, cfg.algo.batch_size)
        if cfg.algo.obs_norm:
            obs_n = state.obs_rms.normalize(batch["obs"])
            next_obs_n = state.obs_rms.normalize(batch["next_obs"])
        else:
            obs_n, next_obs_n = batch["obs"], batch["next_obs"]

        # --- critic ---
        next_actions = base.target_policy_actions(
            cfg, self.actor, state.actor_target, next_obs_n, k_tgt
        )
        q_next = self.critic.apply(
            state.critic_target, next_obs_n, next_actions, method=type(self.critic).q_min
        )
        gamma_n = cfg.algo.gamma ** cfg.algo.nstep
        target_q = batch["reward"] + (1.0 - batch["done"]) * gamma_n * q_next
        target_q = jax.lax.stop_gradient(target_q)
        critic_loss, c_grads = jax.value_and_grad(self._critic_loss_fn)(
            state.critic_params, target_q, obs_n, batch["action"]
        )
        c_updates, critic_opt = self.critic_tx.update(
            c_grads, state.critic_opt, state.critic_params
        )
        critic_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.critic_params, c_updates
        )

        # --- actor (critic frozen: grads flow only into actor params) ---
        actor_loss, a_grads = jax.value_and_grad(self._actor_loss_fn)(
            state.actor_params, jax.lax.stop_gradient(critic_params), obs_n
        )
        a_updates, actor_opt = self.actor_tx.update(a_grads, state.actor_opt, state.actor_params)
        actor_params = jax.tree_util.tree_map(lambda p, u: p + u, state.actor_params, a_updates)

        # --- targets ---
        critic_target = soft_update(state.critic_target, critic_params, cfg.algo.tau)
        actor_target = (
            actor_params
            if cfg.algo.no_tgt_actor
            else soft_update(state.actor_target, actor_params, cfg.algo.tau)
        )
        state = state.replace(
            actor_params=actor_params,
            actor_opt=actor_opt,
            actor_target=actor_target,
            critic_params=critic_params,
            critic_opt=critic_opt,
            critic_target=critic_target,
            update_count=state.update_count + 1,
        )
        return state, (critic_loss, actor_loss)

    def _update(self, state: OffPolicyState):
        cfg = self.cfg
        rng, k = jax.random.split(state.rng)
        keys = jax.random.split(k, cfg.algo.update_times)

        def body(s, key):
            return self._one_update(s, key)

        state, (c_losses, a_losses) = jax.lax.scan(body, state, keys)
        metrics = {
            "train/critic_loss": jnp.mean(c_losses),
            "train/actor_loss": jnp.mean(a_losses),
            **state.stats.metrics(),
        }
        return state.replace(rng=rng), metrics

    # ------------------------------------------------------- composed API

    def train_iter(self, state):
        """One explore(horizon) + update_times updates — the inner loop of
        reference train_baselines.py:53-61."""
        state = self.explore(state, horizon=self.cfg.algo.horizon_len)
        return self.update(state)

    def warmup(self, state):
        """Random warm-up exploration (train_baselines.py:49-51)."""
        return self.explore(state, horizon=self.cfg.algo.warm_up, random=True), {}

    # ---------------------------------------------------------- eval hooks

    def eval_actor_apply(self, params, obs_n):
        """Deterministic action for evaluation."""
        return self.actor.apply(params, obs_n)
