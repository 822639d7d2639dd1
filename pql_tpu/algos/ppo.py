"""PPO (reference pql/algo/ppo.py).

On-policy rollout + GAE with timeout XOR-masking + clipped-ratio policy
loss and clipped value loss, optional value normalization — reproduced as
one jitted train iteration:

- rollout stores (obs, action, logp, reward, done, value) with the
  reference's alignment: dones[t] marks that obs[t] started a fresh
  episode (ppo.py:44-60);
- GAE bootstraps through timeouts via
  nextnonterminal2 = XOR(1 − done[t+1], truncated[t]) (ppo.py:97-100);
- update_times epochs over shuffled minibatches, advantages normalized
  per-minibatch, entropy bonus, clipped value loss (ppo.py:136-182).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pql_tpu.algos import base
from pql_tpu.envs.base import VecEnv
from pql_tpu.ops import RunningMeanStd
from pql_tpu.utils.trackers import EpisodeStats


@struct.dataclass
class PPOState:
    actor_params: Any
    actor_opt: Any
    critic_params: Any
    critic_opt: Any
    obs_rms: RunningMeanStd
    value_rms: RunningMeanStd
    env_state: Any
    obs: jax.Array
    dones: jax.Array  # [E] — done flag that produced the current obs
    stats: EpisodeStats
    rng: jax.Array
    env_steps: jax.Array
    update_count: jax.Array


class PPO:
    name = "PPO"

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
        ) = self._build_models(cfg, env, jax.random.PRNGKey(cfg.seed))
        buffer_size = cfg.algo.horizon_len * cfg.num_envs
        if buffer_size % cfg.algo.batch_size:
            raise ValueError(
                f"horizon_len*num_envs={buffer_size} must be divisible by "
                f"batch_size={cfg.algo.batch_size}"
            )
        self.n_minibatches = buffer_size // cfg.algo.batch_size
        self.train_iter = jax.jit(self._train_iter)

    def _build_models(self, cfg, env, rng):
        """Model-construction hook (overridden by the equivariant EQG)."""
        return base.init_actor_critic(cfg, env, rng)

    def init(self, rng) -> PPOState:
        cfg, env = self.cfg, self.env
        k_env, k_loop = jax.random.split(rng)
        env_state, obs = env.reset(k_env)
        return PPOState(
            actor_params=self._actor_params0,
            actor_opt=self._actor_opt0,
            critic_params=self._critic_params0,
            critic_opt=self._critic_opt0,
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

    # ------------------------------------------------------------- rollout

    def _rollout(self, state: PPOState, rng):
        cfg, env = self.cfg, self.env

        def step_fn(carry, _):
            env_state, obs, dones, obs_rms, value_rms, stats, k = carry
            k, k_a, k_e = jax.random.split(k, 3)
            if cfg.algo.obs_norm:
                obs_rms = obs_rms.update(obs)
                obs_n = obs_rms.normalize(obs)
            else:
                obs_n = obs
            action, logp, _ = self.actor.apply(
                state.actor_params, obs_n, k_a, method=type(self.actor).sample
            )
            value = self.critic.apply(state.critic_params, obs_n)[..., 0]
            if cfg.algo.value_norm:
                value_rms = value_rms.update(value[:, None])
                value = value_rms.unnormalize(value[:, None])[:, 0]
            env_state, next_obs, reward, done, info = env.step(env_state, action, k_e)
            stats = stats.update(reward, done, info)
            out = dict(
                obs=obs,
                dones=dones,  # done that PRODUCED obs (ppo.py:46-49)
                action=action,
                logp=logp,
                reward=cfg.algo.reward_scale * reward,
                value=value,
                truncated=info["truncated"].astype(jnp.float32),
            )
            return (env_state, next_obs, done, obs_rms, value_rms, stats, k), out

        carry = (
            state.env_state, state.obs, state.dones, state.obs_rms,
            state.value_rms, state.stats, rng,
        )
        carry, traj = jax.lax.scan(step_fn, carry, None, length=cfg.algo.horizon_len)
        env_state, obs, dones, obs_rms, value_rms, stats, _ = carry
        state = state.replace(
            env_state=env_state, obs=obs, dones=dones, obs_rms=obs_rms,
            value_rms=value_rms, stats=stats,
            env_steps=state.env_steps + cfg.algo.horizon_len * env.num_envs,
        )
        return state, traj

    # ----------------------------------------------------------- advantage

    def _compute_adv(self, state: PPOState, traj):
        """GAE with timeout XOR-masking (ppo.py:75-116)."""
        cfg = self.cfg
        obs_n = (
            state.obs_rms.normalize(state.obs) if cfg.algo.obs_norm else state.obs
        )
        next_value = self.critic.apply(state.critic_params, obs_n)[..., 0]
        value_rms = state.value_rms
        if cfg.algo.value_norm:
            value_rms = value_rms.update(next_value[:, None])
            next_value = value_rms.unnormalize(next_value[:, None])[:, 0]

        gamma, lam = cfg.algo.gamma, cfg.algo.lambda_gae_adv

        def gae_step(carry, step):
            lastgaelam, nextvalues, nextnonterminal = carry
            # scanning in reverse over t: nextnonterminal = 1 - dones[t+1],
            # where traj["dones"][t+1] is the done flag after step t
            nextnonterminal2 = jnp.logical_xor(
                nextnonterminal > 0.5, step["truncated"] > 0.5
            ).astype(jnp.float32)
            if not cfg.algo.use_gae:
                # plain discounted returns path (ppo.py:108-115)
                returns = step["reward"] + gamma * nextnonterminal * nextvalues
                return (returns, returns, 1.0 - step["dones"]), returns
            delta = (
                step["reward"] + gamma * nextvalues * nextnonterminal2 - step["value"]
            )
            lastgaelam = delta + gamma * lam * nextnonterminal * lastgaelam
            return (lastgaelam, step["value"], 1.0 - step["dones"]), lastgaelam

        zeros = jnp.zeros_like(next_value)
        init = (zeros, next_value, 1.0 - state.dones)
        _, adv_or_ret = jax.lax.scan(gae_step, init, traj, reverse=True)
        if cfg.algo.use_gae:
            advantages = adv_or_ret
            returns = advantages + traj["value"]
        else:
            returns = adv_or_ret
            advantages = returns - traj["value"]

        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        b_obs = flat(traj["obs"])
        b_actions = flat(traj["action"])
        b_logp = flat(traj["logp"])
        b_adv = flat(advantages)
        if cfg.algo.value_norm:
            value_rms = value_rms.update(returns.reshape(-1, 1))
            b_returns = value_rms.normalize(returns.reshape(-1, 1))[:, 0]
            value_rms = value_rms.update(traj["value"].reshape(-1, 1))
            b_values = value_rms.normalize(traj["value"].reshape(-1, 1))[:, 0]
        else:
            b_returns = flat(returns)
            b_values = flat(traj["value"])
        state = state.replace(value_rms=value_rms)
        return state, (b_obs, b_actions, b_logp, b_adv, b_returns, b_values)

    # -------------------------------------------------------------- update

    def _minibatch_update(self, carry, batch):
        state = carry
        cfg = self.cfg
        obs, actions, logp_old, adv, returns, values_old = batch
        obs_n = state.obs_rms.normalize(obs) if cfg.algo.obs_norm else obs
        adv = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)

        def actor_loss_fn(actor_params):
            logp_new, entropy = self.actor.apply(
                actor_params, obs_n, actions, method=type(self.actor).logprob_entropy
            )
            ratio = jnp.exp(logp_new - logp_old)
            l1 = -adv * ratio
            l2 = -adv * jnp.clip(ratio, 1 - cfg.algo.ratio_clip, 1 + cfg.algo.ratio_clip)
            return jnp.mean(jnp.maximum(l1, l2)) - cfg.algo.lambda_entropy * jnp.mean(entropy)

        def critic_loss_fn(critic_params):
            v = self.critic.apply(critic_params, obs_n)[..., 0]
            if cfg.algo.value_clip:
                unclipped = jnp.square(v - returns)
                v_clip = values_old + jnp.clip(
                    v - values_old, -cfg.algo.ratio_clip, cfg.algo.ratio_clip
                )
                clipped = jnp.square(v_clip - returns)
                return 0.5 * jnp.mean(jnp.maximum(unclipped, clipped))
            return 0.5 * jnp.mean(jnp.square(v - returns))

        actor_loss, a_grads = jax.value_and_grad(actor_loss_fn)(state.actor_params)
        a_updates, actor_opt = self.actor_tx.update(a_grads, state.actor_opt, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, a_updates)

        critic_loss, c_grads = jax.value_and_grad(critic_loss_fn)(state.critic_params)
        c_updates, critic_opt = self.critic_tx.update(c_grads, state.critic_opt, state.critic_params)
        critic_params = optax.apply_updates(state.critic_params, c_updates)

        state = state.replace(
            actor_params=actor_params,
            actor_opt=actor_opt,
            critic_params=critic_params,
            critic_opt=critic_opt,
            update_count=state.update_count + 1,
        )
        return state, (critic_loss, actor_loss)

    def _train_iter(self, state: PPOState):
        cfg = self.cfg
        rng, k_roll, k_perm = jax.random.split(state.rng, 3)
        state = state.replace(rng=rng)
        state, traj = self._rollout(state, k_roll)
        state, data = self._compute_adv(state, traj)
        buffer_size = data[0].shape[0]

        def epoch(state, key):
            perm = jax.random.permutation(key, buffer_size)
            mb = tuple(
                x[perm].reshape((self.n_minibatches, cfg.algo.batch_size) + x.shape[1:])
                for x in data
            )
            return jax.lax.scan(self._minibatch_update, state, mb)

        def epochs_body(state, key):
            state, losses = epoch(state, key)
            return state, losses

        keys = jax.random.split(k_perm, cfg.algo.update_times)
        state, (c_losses, a_losses) = jax.lax.scan(epochs_body, state, keys)
        metrics = {
            "train/critic_loss": jnp.mean(c_losses),
            "train/actor_loss": jnp.mean(a_losses),
            **state.stats.metrics(),
        }
        return state, metrics

    # ---------------------------------------------------------- eval hook

    def eval_actor_apply(self, params, obs_n):
        mean, _ = self.actor.apply(params, obs_n)
        return mean
