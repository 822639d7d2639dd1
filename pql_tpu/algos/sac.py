"""Soft Actor-Critic (reference pql/algo/sac.py).

Squashed-Gaussian policy, twin-Q critic with target, learned temperature α
with target entropy −action_dim (reference sac.py:22-26,34-43,135-137).
Shares the DDPG skeleton (explore → n-step replay → update_times updates);
only the policy class, the entropy-regularized TD target, and the α update
differ.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pql_tpu.algos import base
from pql_tpu.algos.ddpg import DDPG, OffPolicyState
from pql_tpu.models.mlp import TanhDiagGaussianMLPPolicy
from pql_tpu.ops import soft_update


@struct.dataclass
class SACState(OffPolicyState):
    log_alpha: jax.Array = None
    alpha_opt: Any = None


class SAC(DDPG):
    name = "SAC"

    def __init__(self, cfg, env):
        super().__init__(cfg, env)
        self.alpha_tx = optax.adamw(cfg.algo.alpha_lr, weight_decay=0.01)
        self.target_entropy = -float(env.action_dim)

        def action_fn(params, obs_n, rng, *, random: bool, **_kw):
            """Stochastic policy sampling (sac.py:47-51); uniform warm-up."""
            if random:
                shape = (obs_n.shape[0], env.action_dim)
                return jax.random.uniform(rng, shape, jnp.float32, -1.0, 1.0)
            a, _ = self.actor.apply(params, obs_n, rng, method=TanhDiagGaussianMLPPolicy.sample)
            return a

        self.action_fn = action_fn

    def init(self, rng) -> SACState:
        s = super().init(rng)
        log_alpha = jnp.zeros((1,), jnp.float32)  # sac.py:23
        return SACState(
            **{f: getattr(s, f) for f in s.__dataclass_fields__},
            log_alpha=log_alpha,
            alpha_opt=self.alpha_tx.init(log_alpha),
        )

    def _one_update(self, state: SACState, rng):
        cfg = self.cfg
        from pql_tpu.replay import replay_sample

        k_sample, k_next, k_cur = jax.random.split(rng, 3)
        batch = replay_sample(state.replay, k_sample, cfg.algo.batch_size)
        if cfg.algo.obs_norm:
            obs_n = state.obs_rms.normalize(batch["obs"])
            next_obs_n = state.obs_rms.normalize(batch["next_obs"])
        else:
            obs_n, next_obs_n = batch["obs"], batch["next_obs"]

        alpha = (
            jnp.exp(state.log_alpha[0]) if cfg.algo.alpha is None else cfg.algo.alpha
        )

        # --- critic: entropy-regularized TD target (sac.py:117-125) ---
        next_actions, next_logp = self.actor.apply(
            state.actor_params, next_obs_n, k_next, method=TanhDiagGaussianMLPPolicy.sample
        )
        q_next = self.critic.apply(
            state.critic_target, next_obs_n, next_actions, method=type(self.critic).q_min
        )
        gamma_n = cfg.algo.gamma ** cfg.algo.nstep
        target_q = batch["reward"] + (1.0 - batch["done"]) * gamma_n * (
            q_next - jax.lax.stop_gradient(alpha) * next_logp
        )
        target_q = jax.lax.stop_gradient(target_q)
        critic_loss, c_grads = jax.value_and_grad(self._critic_loss_fn)(
            state.critic_params, target_q, obs_n, batch["action"]
        )
        c_updates, critic_opt = self.critic_tx.update(c_grads, state.critic_opt, state.critic_params)
        critic_params = optax.apply_updates(state.critic_params, c_updates)

        # --- actor: α·logπ − Q (sac.py:128-134) ---
        def actor_loss_fn(actor_params):
            actions, logp = self.actor.apply(
                actor_params, obs_n, k_cur, method=TanhDiagGaussianMLPPolicy.sample
            )
            q = self.critic.apply(
                jax.lax.stop_gradient(critic_params), obs_n, actions,
                method=type(self.critic).q_min,
            )
            loss = jnp.mean(jax.lax.stop_gradient(alpha) * logp - q)
            return loss, logp

        (actor_loss, logp), a_grads = jax.value_and_grad(actor_loss_fn, has_aux=True)(
            state.actor_params
        )
        a_updates, actor_opt = self.actor_tx.update(a_grads, state.actor_opt, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, a_updates)

        # --- temperature (sac.py:136-138) ---
        log_alpha, alpha_opt = state.log_alpha, state.alpha_opt
        if cfg.algo.alpha is None:

            def alpha_loss_fn(log_alpha):
                a = jnp.exp(log_alpha[0])
                return jnp.mean(
                    a * jax.lax.stop_gradient(-logp - self.target_entropy)
                )

            al_grads = jax.grad(alpha_loss_fn)(log_alpha)
            al_updates, alpha_opt = self.alpha_tx.update(al_grads, alpha_opt, log_alpha)
            log_alpha = optax.apply_updates(log_alpha, al_updates)

        critic_target = soft_update(state.critic_target, critic_params, cfg.algo.tau)
        state = state.replace(
            actor_params=actor_params,
            actor_opt=actor_opt,
            critic_params=critic_params,
            critic_opt=critic_opt,
            critic_target=critic_target,
            log_alpha=log_alpha,
            alpha_opt=alpha_opt,
            update_count=state.update_count + 1,
        )
        return state, (critic_loss, actor_loss)

    def eval_actor_apply(self, params, obs_n):
        return self.actor.apply(params, obs_n, method=TanhDiagGaussianMLPPolicy.mean_action)
