"""MAPPO — shared actor + centralized critic (reference pql/algo/mappo.py).

One actor is shared by both hands and applied to the per-hand obs slices
batched as 2×num_envs rows (right half then left half, reference
mappo.py:42-66); the critic is *centralized*: it sees the full joint
observation (``shared_obs``, mappo.py:24,57) for both agent rows. Both
agents receive the same (whole-env) reward and done signals, repeated
(mappo.py:72-74), so the advantage differs per agent only through the
per-hand observations.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pql_tpu.algos import base, ma_base
from pql_tpu.envs.base import VecEnv
from pql_tpu.models import get_model
from pql_tpu.ops import RunningMeanStd
from pql_tpu.utils.trackers import EpisodeStats


@struct.dataclass
class MAPPOState:
    actor_params: Any
    actor_opt: Any
    critic_params: Any
    critic_opt: Any
    obs_rms: RunningMeanStd  # joint obs
    value_rms: RunningMeanStd
    env_state: Any
    obs: jax.Array
    dones: jax.Array
    stats: EpisodeStats
    rng: jax.Array
    env_steps: jax.Array
    update_count: jax.Array


class MAPPO:
    name = "MAPPO"

    def __init__(self, cfg, env: VecEnv):
        self.cfg = cfg
        self.env = env
        self.ma = ma_base.MultiAgentCtx(env)
        if self.ma.obs_dims[0] != self.ma.obs_dims[1]:
            raise ValueError("MAPPO's shared actor requires equal per-hand obs dims")

        dtype = base.compute_dtype(cfg)
        self.actor = get_model(cfg.algo.act_class)(act_dim=self.ma.action_dim, dtype=dtype)
        self.critic = get_model(cfg.algo.cri_class)(dtype=dtype)
        self.actor_tx = base.build_optimizer(cfg.algo.actor_lr, cfg.algo.max_grad_norm)
        self.critic_tx = base.build_optimizer(cfg.algo.critic_lr, cfg.algo.max_grad_norm)
        self.train_iter = jax.jit(self._train_iter)

    def init(self, rng) -> MAPPOState:
        cfg, env = self.cfg, self.env
        k_a, k_c, k_env, k_loop = jax.random.split(rng, 4)
        actor_params = self.actor.init(k_a, jnp.zeros((1, self.ma.obs_dims[0])))
        critic_params = self.critic.init(k_c, jnp.zeros((1, self.ma.shared_obs_dim)))
        env_state, obs = env.reset(k_env)
        return MAPPOState(
            actor_params=actor_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic_params=critic_params,
            critic_opt=self.critic_tx.init(critic_params),
            obs_rms=RunningMeanStd.create((env.obs_dim,)),
            value_rms=RunningMeanStd.create((1,)),
            env_state=env_state,
            obs=obs,
            dones=jnp.zeros(env.num_envs, jnp.float32),
            stats=base.make_stats(cfg, env),
            rng=k_loop,
            env_steps=jnp.zeros((), jnp.int32),
            update_count=jnp.zeros((), jnp.int32),
        )

    # --------------------------------------------------------------- rollout

    def _norm(self, obs_rms, obs):
        return obs_rms.normalize(obs) if self.cfg.algo.obs_norm else obs

    def _rollout(self, state: MAPPOState, rng):
        """Collect [T, 2E] agent-batched trajectories (mappo.py:40-92)."""
        cfg, env = self.cfg, self.env

        def step_fn(carry, _):
            env_state, obs, dones, obs_rms, v_rms, stats, k = carry
            k, k_a, k_e = jax.random.split(k, 3)
            tracker = env.symmetry_tracker(env_state)
            if cfg.algo.obs_norm:
                obs_rms = obs_rms.update(obs)
            obs_n = self._norm(obs_rms, obs)
            ob_r, ob_l = self.ma.split_obs(obs_n, tracker)
            agent_obs = jnp.concatenate([ob_r, ob_l], axis=0)  # [2E, d]
            shared_obs = jnp.concatenate([obs_n, obs_n], axis=0)  # [2E, D]

            action, logp, _ = self.actor.apply(
                state.actor_params, agent_obs, k_a, method=type(self.actor).sample
            )
            value = self.critic.apply(state.critic_params, shared_obs)[..., 0]
            if cfg.algo.value_norm:
                v_rms = v_rms.update(value[:, None])
                value = v_rms.unnormalize(value[:, None])[:, 0]

            n = env.num_envs
            execute = self.ma.merge_actions(action[:n], action[n:], tracker)
            env_state, next_obs, reward, done, info = env.step(env_state, execute, k_e)
            stats = stats.update(reward, done, info)
            rep = lambda x: jnp.concatenate([x, x], axis=0)
            out = dict(
                obs=agent_obs, shared_obs=shared_obs, dones=rep(dones),
                action=action, logp=logp,
                reward=rep(cfg.algo.reward_scale * reward),
                value=value,
                truncated=rep(info["truncated"].astype(jnp.float32)),
            )
            return (env_state, next_obs, done, obs_rms, v_rms, stats, k), out

        carry = (
            state.env_state, state.obs, state.dones, state.obs_rms,
            state.value_rms, state.stats, rng,
        )
        carry, traj = jax.lax.scan(step_fn, carry, None, length=cfg.algo.horizon_len)
        env_state, obs, dones, obs_rms, v_rms, stats, _ = carry
        state = state.replace(
            env_state=env_state, obs=obs, dones=dones, obs_rms=obs_rms,
            value_rms=v_rms, stats=stats,
            env_steps=state.env_steps + cfg.algo.horizon_len * env.num_envs,
        )
        return state, traj

    # ---------------------------------------------------------------- update

    def _train_iter(self, state: MAPPOState):
        cfg = self.cfg
        rng, k_roll, k_perm = jax.random.split(state.rng, 3)
        state = state.replace(rng=rng)
        state, traj = self._rollout(state, k_roll)

        # bootstrap value from the centralized critic on the final joint obs
        obs_n = self._norm(state.obs_rms, state.obs)
        shared_last = jnp.concatenate([obs_n, obs_n], axis=0)
        next_value = self.critic.apply(state.critic_params, shared_last)[..., 0]
        v_rms = state.value_rms
        if cfg.algo.value_norm:
            v_rms = v_rms.update(next_value[:, None])
            next_value = v_rms.unnormalize(next_value[:, None])[:, 0]
        next_done = jnp.concatenate([state.dones, state.dones], axis=0)

        adv, ret = ma_base.gae(
            traj["reward"], traj["dones"], traj["value"], traj["truncated"],
            next_value, next_done, cfg.algo.gamma, cfg.algo.lambda_gae_adv,
            cfg.algo.use_gae,
        )
        f = ma_base.flat
        if cfg.algo.value_norm:
            v_rms = v_rms.update(ret.reshape(-1, 1))
            b_ret = v_rms.normalize(ret.reshape(-1, 1))[:, 0]
            v_rms = v_rms.update(traj["value"].reshape(-1, 1))
            b_val = v_rms.normalize(traj["value"].reshape(-1, 1))[:, 0]
        else:
            b_ret, b_val = f(ret), f(traj["value"])
        state = state.replace(value_rms=v_rms)
        data = (
            f(traj["obs"]), f(traj["shared_obs"]), f(traj["action"]),
            f(traj["logp"]), f(adv), b_ret, b_val,
        )

        def minibatch_update(state, batch):
            obs, shared_obs, actions, logp_old, adv, returns, v_old = batch
            adv = ma_base.normalize_advantages(adv)

            def actor_obj(p):
                logp_new, entropy = self.actor.apply(
                    p, obs, actions, method=type(self.actor).logprob_entropy
                )
                return ma_base.ppo_actor_loss(
                    logp_new, logp_old, adv, entropy, cfg.algo.ratio_clip,
                    cfg.algo.lambda_entropy,
                )

            def critic_obj(p):
                v_new = self.critic.apply(p, shared_obs)[..., 0]
                return ma_base.ppo_value_loss(
                    v_new, returns, v_old, cfg.algo.ratio_clip, cfg.algo.value_clip
                )

            a_loss, a_grads = jax.value_and_grad(actor_obj)(state.actor_params)
            a_upd, actor_opt = self.actor_tx.update(a_grads, state.actor_opt, state.actor_params)
            c_loss, c_grads = jax.value_and_grad(critic_obj)(state.critic_params)
            c_upd, critic_opt = self.critic_tx.update(c_grads, state.critic_opt, state.critic_params)
            state = state.replace(
                actor_params=optax.apply_updates(state.actor_params, a_upd),
                actor_opt=actor_opt,
                critic_params=optax.apply_updates(state.critic_params, c_upd),
                critic_opt=critic_opt,
                update_count=state.update_count + 1,
            )
            return state, (c_loss, a_loss)

        # 2E*T rows; batch_size rows per minibatch (mappo.py update_net)
        def epoch(state, key):
            mb = ma_base.epoch_minibatches(key, data, cfg.algo.batch_size)
            return jax.lax.scan(minibatch_update, state, mb)

        keys = jax.random.split(k_perm, cfg.algo.update_times)
        state, (c_losses, a_losses) = jax.lax.scan(lambda s, k: epoch(s, k), state, keys)
        metrics = {
            "train/critic_loss": jnp.mean(c_losses),
            "train/actor_loss": jnp.mean(a_losses),
            **state.stats.metrics(),
        }
        return state, metrics

    # ------------------------------------------------------------- eval hook

    def eval_actor_apply(self, params, obs_n):
        ob_r, ob_l = self.ma.split_obs(obs_n, None)
        mean_r, _ = self.actor.apply(params, ob_r)
        mean_l, _ = self.actor.apply(params, ob_l)
        return self.ma.merge_actions(mean_r, mean_l, None)
