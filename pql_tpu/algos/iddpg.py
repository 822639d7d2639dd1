"""IDDPG — independent two-hand DDPG (reference pql/algo/iddpg.py).

Off-policy counterpart of IPPO: one shared n-step replay stores the JOINT
transition with two reward channels (right, left — the reference threads a
separate ``reward_left`` tensor through the FIFO and buffer, reference
pql/replay/nstep_replay.py:25-27, simple_replay.py:36-38). Per hand there
is an actor, a Double-Q critic and its target; updates split the stored
joint obs/action back into per-hand views through the SymmetryManager
(reference iddpg.py:172-177, action split at the joint midpoint) and run
the standard TD + DPG steps per hand.

Exploration merges the two hands' deterministic actions and adds
mixed/fixed noise on the JOINT action vector (reference
iddpg.py:106-117).

Note: the reference's ``update_actor`` freezes the *actor* during the DPG
step (``actor.requires_grad_(False)``, iddpg.py:215-221), which would
make the update a no-op in eager torch; the intended semantics (critic
frozen, actor trained) is what is implemented here.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from pql_tpu.algos import base, ma_base
from pql_tpu.envs.base import VecEnv, handle_timeout
from pql_tpu.models import get_model
from pql_tpu.ops import RunningMeanStd, add_mixed_normal_noise, add_normal_noise, soft_update
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
class IDDPGState:
    params: dict[str, Any]  # actor/critic/critic_target per hand
    opts: dict[str, Any]
    obs_rms: RunningMeanStd
    env_state: Any
    obs: jax.Array
    nstep: Any
    replay: Any
    stats: EpisodeStats
    rng: jax.Array
    env_steps: jax.Array
    update_count: jax.Array


class IDDPG:
    name = "IDDPG"

    def __init__(self, cfg, env: VecEnv):
        self.cfg = cfg
        self.env = env
        self.ma = ma_base.MultiAgentCtx(env)
        dtype = base.compute_dtype(cfg)
        act_cls = get_model(cfg.algo.act_class)
        cri_cls = get_model(cfg.algo.cri_class)
        a_dim = self.ma.action_dim
        self.actor = act_cls(act_dim=a_dim, dtype=dtype)
        self.actor_left = act_cls(act_dim=a_dim, dtype=dtype)
        self.critic = cri_cls(dtype=dtype)
        self.critic_left = cri_cls(dtype=dtype)
        self.actor_tx = base.build_optimizer(cfg.algo.actor_lr, cfg.algo.max_grad_norm)
        self.critic_tx = base.build_optimizer(cfg.algo.critic_lr, cfg.algo.max_grad_norm)
        self.explore = jax.jit(self._explore, static_argnames=("random", "horizon"))
        self.update = jax.jit(self._update)

    # ------------------------------------------------------------------ init

    def init(self, rng) -> IDDPGState:
        cfg, env = self.cfg, self.env
        k = jax.random.split(rng, 6)
        d_r, d_l = self.ma.obs_dims
        a = self.ma.action_dim
        params = {
            "actor": self.actor.init(k[0], jnp.zeros((1, d_r))),
            "actor_left": self.actor_left.init(k[1], jnp.zeros((1, d_l))),
            "critic": self.critic.init(k[2], jnp.zeros((1, d_r)), jnp.zeros((1, a))),
            "critic_left": self.critic_left.init(k[3], jnp.zeros((1, d_l)), jnp.zeros((1, a))),
        }
        params["critic_target"] = params["critic"]
        params["critic_target_left"] = params["critic_left"]
        opts = {
            "actor": self.actor_tx.init(params["actor"]),
            "actor_left": self.actor_tx.init(params["actor_left"]),
            "critic": self.critic_tx.init(params["critic"]),
            "critic_left": self.critic_tx.init(params["critic_left"]),
        }
        env_state, obs = env.reset(k[4])
        slots = replay_slots(cfg.algo.memory_size, env.num_envs, cfg.algo.horizon_len)
        return IDDPGState(
            params=params,
            opts=opts,
            obs_rms=RunningMeanStd.create((env.obs_dim,)),
            env_state=env_state,
            obs=obs,
            nstep=create_nstep(
                env.num_envs, env.obs_dim, env.action_dim, cfg.algo.nstep,
                cfg.algo.gamma, reward_dim=2,
            ),
            replay=create_replay(
                slots=slots,
                num_envs=env.num_envs,
                obs_dim=env.obs_dim,
                action_dim=env.action_dim,
                obs_dtype=jnp.bfloat16 if cfg.algo.replay_dtype == "bfloat16" else jnp.float32,
                valid_start=cfg.algo.nstep - 1,
                reward_dim=2,
            ),
            stats=base.make_stats(cfg, env),
            rng=k[5],
            env_steps=jnp.zeros((), jnp.int32),
            update_count=jnp.zeros((), jnp.int32),
        )

    # --------------------------------------------------------------- explore

    def _joint_policy_action(self, params, obs_n, tracker, rng):
        """Both hands' deterministic actions merged + exploration noise on
        the joint vector (reference iddpg.get_actions, :88-110)."""
        cfg = self.cfg
        ob_r, ob_l = self.ma.split_obs(obs_n, tracker)
        act_r = self.actor.apply(params["actor"], ob_r)
        act_l = self.actor_left.apply(params["actor_left"], ob_l)
        action = self.ma.merge_actions(act_r, act_l, tracker)
        noise = cfg.algo.noise
        if noise.type == "mixed":
            return add_mixed_normal_noise(
                rng, action, noise.std_min, noise.std_max, out_bounds=(-1.0, 1.0),
                num_envs_global=self.env.num_envs, global_start=0,
            )
        return add_normal_noise(rng, action, noise.std_max, out_bounds=(-1.0, 1.0))

    def _explore(self, state: IDDPGState, *, horizon: int, random: bool = False):
        cfg, env = self.cfg, self.env

        def step_fn(carry, _):
            env_state, obs, obs_rms, stats, k = carry
            k, k_a, k_e = jax.random.split(k, 3)
            tracker = env.symmetry_tracker(env_state)
            if cfg.algo.obs_norm:
                obs_rms = obs_rms.update(obs)
                obs_n = obs_rms.normalize(obs)
            else:
                obs_n = obs
            if random:
                action = jax.random.uniform(
                    k_a, (env.num_envs, env.action_dim), jnp.float32, -1.0, 1.0
                )
            else:
                action = self._joint_policy_action(state.params, obs_n, tracker, k_a)
            env_state, next_obs, reward, done, info = env.step(env_state, action, k_e)
            rew_r, rew_l = self.ma.split_reward(info, tracker)
            stats = stats.update(rew_r + rew_l, done, info)
            done_b = handle_timeout(done, info) if cfg.algo.handle_timeout else done
            rew2 = cfg.algo.reward_scale * jnp.stack([rew_r, rew_l], axis=-1)  # [E,2]
            out = dict(obs=obs, action=action, reward=rew2, next_obs=next_obs,
                       done=done_b[..., None])
            return (env_state, next_obs, obs_rms, stats, k), out

        rng, k_roll = jax.random.split(state.rng)
        carry = (state.env_state, state.obs, state.obs_rms, state.stats, k_roll)
        carry, traj = jax.lax.scan(step_fn, carry, None, length=horizon)
        env_state, obs, obs_rms, stats, _ = carry
        nstep, emitted, _ = nstep_scan(state.nstep, traj)
        replay = replay_add(state.replay, emitted)
        return state.replace(
            env_state=env_state, obs=obs, obs_rms=obs_rms, stats=stats,
            nstep=nstep, replay=replay, rng=rng,
            env_steps=state.env_steps + horizon * env.num_envs,
        )

    # ---------------------------------------------------------------- update

    def _hand_update(self, params, opts, side: str, batch_views, rng):
        """TD + DPG for one hand (reference iddpg.py:164-186, 208-221)."""
        cfg = self.cfg
        sfx = "" if side == "right" else "_left"
        actor = self.actor if side == "right" else self.actor_left
        critic = self.critic if side == "right" else self.critic_left
        obs, action, reward, next_obs, done = batch_views

        # critic: target actions from the live actor (no_tgt_actor default)
        next_act = actor.apply(params[f"actor{sfx}"], next_obs)
        b = cfg.algo.noise.tgt_pol_noise_bound
        next_act = add_normal_noise(
            rng, next_act, cfg.algo.noise.tgt_pol_std, noise_bounds=(-b, b),
            out_bounds=(-1.0, 1.0),
        )
        q_next = critic.apply(
            params[f"critic_target{sfx}"], next_obs, next_act, method=type(critic).q_min
        )
        gamma_n = cfg.algo.gamma ** cfg.algo.nstep
        target_q = jax.lax.stop_gradient(reward + (1.0 - done) * gamma_n * q_next)

        def critic_loss_fn(p):
            q1, q2 = critic.apply(p, obs, action)
            return jnp.mean(jnp.square(q1 - target_q)) + jnp.mean(jnp.square(q2 - target_q))

        c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(params[f"critic{sfx}"])
        c_upd, opts[f"critic{sfx}"] = self.critic_tx.update(
            c_grads, opts[f"critic{sfx}"], params[f"critic{sfx}"]
        )
        params[f"critic{sfx}"] = jax.tree_util.tree_map(
            lambda p, u: p + u, params[f"critic{sfx}"], c_upd
        )

        def actor_loss_fn(p):
            a = actor.apply(p, obs)
            q = critic.apply(
                jax.lax.stop_gradient(params[f"critic{sfx}"]), obs, a,
                method=type(critic).q_min,
            )
            return -jnp.mean(q)

        a_loss, a_grads = jax.value_and_grad(actor_loss_fn)(params[f"actor{sfx}"])
        a_upd, opts[f"actor{sfx}"] = self.actor_tx.update(
            a_grads, opts[f"actor{sfx}"], params[f"actor{sfx}"]
        )
        params[f"actor{sfx}"] = jax.tree_util.tree_map(
            lambda p, u: p + u, params[f"actor{sfx}"], a_upd
        )
        params[f"critic_target{sfx}"] = soft_update(
            params[f"critic_target{sfx}"], params[f"critic{sfx}"], cfg.algo.tau
        )
        return params, opts, c_loss, a_loss

    def _one_update(self, state: IDDPGState, rng):
        cfg = self.cfg
        k_s, k_r, k_l = jax.random.split(rng, 3)
        batch = replay_sample(
            state.replay, k_s, cfg.algo.batch_size,
            fields=("obs", "action", "reward", "next_obs", "done"),
        )
        if cfg.algo.obs_norm:
            obs_n = state.obs_rms.normalize(batch["obs"])
            next_obs_n = state.obs_rms.normalize(batch["next_obs"])
        else:
            obs_n, next_obs_n = batch["obs"], batch["next_obs"]
        # stored joint transitions are in canonical layout (tracker=None,
        # reference iddpg.py:172-175)
        ob_r, ob_l = self.ma.split_obs(obs_n, None)
        nob_r, nob_l = self.ma.split_obs(next_obs_n, None)
        a = self.ma.action_dim
        act_r, act_l = batch["action"][:, :a], batch["action"][:, a:]
        rew_r, rew_l = batch["reward"][:, 0:1], batch["reward"][:, 1:2]

        params, opts = dict(state.params), dict(state.opts)
        params, opts, c_r, a_r = self._hand_update(
            params, opts, "right", (ob_r, act_r, rew_r, nob_r, batch["done"]), k_r
        )
        params, opts, c_l, a_l = self._hand_update(
            params, opts, "left", (ob_l, act_l, rew_l, nob_l, batch["done"]), k_l
        )
        state = state.replace(params=params, opts=opts, update_count=state.update_count + 1)
        return state, (c_r, a_r, c_l, a_l)

    def _update(self, state: IDDPGState):
        cfg = self.cfg
        rng, k = jax.random.split(state.rng)
        keys = jax.random.split(k, cfg.algo.update_times)
        state, (c_r, a_r, c_l, a_l) = jax.lax.scan(self._one_update, state, keys)
        metrics = {
            "train/critic_loss": jnp.mean(c_r),
            "train/actor_loss": jnp.mean(a_r),
            "train/critic_loss_left": jnp.mean(c_l),
            "train/actor_loss_left": jnp.mean(a_l),
            **state.stats.metrics(),
        }
        return state.replace(rng=rng), metrics

    # ------------------------------------------------------- composed API

    def train_iter(self, state):
        state = self.explore(state, horizon=self.cfg.algo.horizon_len)
        return self.update(state)

    def warmup(self, state):
        return self.explore(state, horizon=self.cfg.algo.warm_up, random=True), {}

    # ------------------------------------------------------------- eval hook

    def eval_actor_apply(self, params, obs_n):
        ob_r, ob_l = self.ma.split_obs(obs_n, None)
        act_r = self.actor.apply(params["actor"], ob_r)
        act_l = self.actor_left.apply(params["actor_left"], ob_l)
        return self.ma.merge_actions(act_r, act_l, None)
