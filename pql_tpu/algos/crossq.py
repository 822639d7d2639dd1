"""CrossQ (reference pql/algo/crossQ.py).

No target critic: the twin-Q network carries BatchNorm layers and both
(obs, action) and (next_obs, next_action) go through ONE joint forward in
train mode, so both halves see the same batch statistics; the next-Q half
is detached for the TD target (reference crossQ.py:144-157,
pql/models/mlp.py:224-241). Exploration and the actor update are the DDPG
ones (deterministic tanh policy + mixed noise).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from flax import struct
from typing import Any

from pql_tpu.algos import base
from pql_tpu.algos.ddpg import DDPG, OffPolicyState
from pql_tpu.replay import replay_sample


@struct.dataclass
class CrossQState(OffPolicyState):
    batch_stats: Any = None


class CrossQ(DDPG):
    name = "CrossQ"

    def init(self, rng) -> CrossQState:
        s = super().init(rng)
        # critic variables include BatchNorm running statistics; the
        # optimizer must only track the trainable params collection
        variables = s.critic_params
        batch_stats = variables.get("batch_stats", {})
        critic_params = {"params": variables["params"]}
        return CrossQState(
            **{
                f: getattr(s, f)
                for f in s.__dataclass_fields__
                if f not in ("critic_params", "critic_target", "critic_opt")
            },
            critic_params=critic_params,
            critic_target=critic_params,  # unused — kept for state shape parity
            critic_opt=self.critic_tx.init(critic_params),
            batch_stats=batch_stats,
        )

    def _one_update(self, state: CrossQState, rng):
        cfg = self.cfg
        k_sample, k_tgt = jax.random.split(rng)
        batch = replay_sample(state.replay, k_sample, cfg.algo.batch_size)
        if cfg.algo.obs_norm:
            obs_n = state.obs_rms.normalize(batch["obs"])
            next_obs_n = state.obs_rms.normalize(batch["next_obs"])
        else:
            obs_n, next_obs_n = batch["obs"], batch["next_obs"]

        next_actions = base.target_policy_actions(
            cfg, self.actor, state.actor_params, next_obs_n, k_tgt
        )
        gamma_n = cfg.algo.gamma ** cfg.algo.nstep
        b = obs_n.shape[0]

        def critic_loss_fn(params, batch_stats):
            variables = {"params": params["params"], "batch_stats": batch_stats}
            all_obs = jnp.concatenate([obs_n, next_obs_n], axis=0)
            all_act = jnp.concatenate([batch["action"], next_actions], axis=0)
            (q1_all, q2_all), updated = self.critic.apply(
                variables, all_obs, all_act, train=True, mutable=["batch_stats"]
            )
            q1, q2 = q1_all[:b], q2_all[:b]
            q_next = jnp.minimum(
                jax.lax.stop_gradient(q1_all[b:]), jax.lax.stop_gradient(q2_all[b:])
            )
            target = jax.lax.stop_gradient(
                batch["reward"] + (1.0 - batch["done"]) * gamma_n * q_next
            )
            loss = jnp.mean(jnp.square(q1 - target)) + jnp.mean(jnp.square(q2 - target))
            return loss, updated["batch_stats"]

        (critic_loss, batch_stats), c_grads = jax.value_and_grad(
            critic_loss_fn, has_aux=True
        )(state.critic_params, state.batch_stats)
        c_updates, critic_opt = self.critic_tx.update(c_grads, state.critic_opt, state.critic_params)
        critic_params = optax.apply_updates(state.critic_params, c_updates)

        # --- actor (crossQ.py:159-166); BN in train mode on the obs batch,
        # running-stat side effects of this pass are discarded ---
        def actor_loss_fn(actor_params):
            action = self.actor.apply(actor_params, obs_n)
            variables = {
                "params": jax.lax.stop_gradient(critic_params)["params"],
                "batch_stats": batch_stats,
            }
            (q1, q2), _ = self.critic.apply(
                variables, obs_n, action, train=True, mutable=["batch_stats"]
            )
            return -jnp.mean(jnp.minimum(q1, q2))

        actor_loss, a_grads = jax.value_and_grad(actor_loss_fn)(state.actor_params)
        a_updates, actor_opt = self.actor_tx.update(a_grads, state.actor_opt, state.actor_params)
        actor_params = optax.apply_updates(state.actor_params, a_updates)

        state = state.replace(
            actor_params=actor_params,
            actor_opt=actor_opt,
            critic_params=critic_params,
            critic_opt=critic_opt,
            batch_stats=batch_stats,
            update_count=state.update_count + 1,
        )
        return state, (critic_loss, actor_loss)
