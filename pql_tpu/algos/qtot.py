"""QTOT — IPPO with an additional TOTAL critic (reference
pql/algo/qtotv1.py, qtotv2.py).

Both variants add a third critic ``critic_tot`` on the combined
observation, trained on the combined (right+left) reward stream
(reference qtotv1.py:37-47, 115, 151). The per-hand actor updates then
mix the individual and total advantages:

- **QTOTV1**: one clipped surrogate on the SUM of the (independently
  normalized) individual and total advantages
  (qtotv1.py:252-258: ``-(adv + adv_tot) · ratio``).
- **QTOTV2**: two separate clipped surrogates — one for the individual
  advantage, one for the total — added together (qtotv2.py:252-263).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from pql_tpu.algos import base, ma_base
from pql_tpu.algos.ippo import IPPO, IPPOState
from pql_tpu.envs.base import VecEnv
from pql_tpu.ops import RunningMeanStd


class _QTOTBase(IPPO):
    sum_advantages = True  # V1: summed; V2: separate clipped terms

    def __init__(self, cfg, env: VecEnv):
        dtype = base.compute_dtype(cfg)
        self.critic_tot = None  # set before super() jits train_iter
        super().__init__(cfg, env)
        self.critic_tot = self.ma.make_critic(cfg, dtype, central=True)
        self.train_iter = jax.jit(self._train_iter)  # re-jit with tot stream

    def _init_params(self, rng):
        k_base, k_tot = jax.random.split(rng)
        params, opts = super()._init_params(k_base)
        params["critic_tot"] = self.critic_tot.init(
            k_tot, jnp.zeros((1, self.env.obs_dim))
        )
        opts["critic_tot"] = self.critic_tx.init(params["critic_tot"])
        return params, opts

    def init(self, rng) -> IPPOState:
        state = super().init(rng)
        return state.replace(value_rms_tot=RunningMeanStd.create((1,)))

    # ------------------------------------------------------------- rollout

    def _extra_step_fields(self, state, obs_n, rew_r, rew_l) -> dict:
        """Total value on the combined obs + combined reward
        (qtotv1.py:115, 151)."""
        val_tot = self.critic_tot.apply(state.params["critic_tot"], obs_n)[..., 0]
        if self.cfg.algo.value_norm:
            val_tot = state.value_rms_tot.unnormalize(val_tot[:, None])[:, 0]
        return {
            "obs_tot": obs_n,
            "val_tot": val_tot,
            "rew_tot": self.cfg.algo.reward_scale * (rew_r + rew_l),
        }

    def _tot_batch(self, state: IPPOState, traj):
        """GAE for the total stream (qtotv1.py:147-151)."""
        cfg = self.cfg
        obs_n = self._norm(state.obs_rms, state.obs)
        v_rms = state.value_rms_tot
        next_value = self.critic_tot.apply(state.params["critic_tot"], obs_n)[..., 0]
        if cfg.algo.value_norm:
            v_rms = v_rms.update(next_value[:, None])
            next_value = v_rms.unnormalize(next_value[:, None])[:, 0]
        adv, ret = ma_base.gae(
            traj["rew_tot"], traj["dones"], traj["val_tot"], traj["truncated"],
            next_value, state.dones, cfg.algo.gamma, cfg.algo.lambda_gae_adv,
            cfg.algo.use_gae,
        )
        f = ma_base.flat
        if cfg.algo.value_norm:
            v_rms = v_rms.update(ret.reshape(-1, 1))
            b_ret = v_rms.normalize(ret.reshape(-1, 1))[:, 0]
            v_rms = v_rms.update(traj["val_tot"].reshape(-1, 1))
            b_val = v_rms.normalize(traj["val_tot"].reshape(-1, 1))[:, 0]
        else:
            b_ret, b_val = f(ret), f(traj["val_tot"])
        return v_rms, (f(traj["obs_tot"]), f(adv), b_ret, b_val)

    # -------------------------------------------------------------- update

    def _actor_surrogate(self, logp_new, logp_old, adv, adv_tot, entropy):
        cfg = self.cfg
        if self.sum_advantages:
            # V1: clip once on the summed advantage (qtotv1.py:252-258)
            return ma_base.ppo_actor_loss(
                logp_new, logp_old, adv + adv_tot, entropy,
                cfg.algo.ratio_clip, cfg.algo.lambda_entropy,
            )
        # V2: separate clipped terms (qtotv2.py:252-263); entropy once
        own = ma_base.ppo_actor_loss(
            logp_new, logp_old, adv, entropy,
            cfg.algo.ratio_clip, cfg.algo.lambda_entropy,
        )
        tot = ma_base.ppo_actor_loss(
            logp_new, logp_old, adv_tot, jnp.zeros_like(entropy),
            cfg.algo.ratio_clip, 0.0,
        )
        return own + tot

    def _minibatch_update(self, state: IPPOState, batches):
        batch_r, batch_l, batch_tot = batches
        cfg = self.cfg
        obs_tot, adv_tot_raw, ret_tot, val_tot = batch_tot
        adv_tot = ma_base.normalize_advantages(adv_tot_raw)
        params, opts = dict(state.params), dict(state.opts)
        losses = {}

        for name, actor, critic, batch in (
            ("", self.actor, self.critic, batch_r),
            ("_left", self.actor_left, self.critic_left, batch_l),
        ):
            obs, actions, logp_old, adv, returns, v_old = batch
            adv = ma_base.normalize_advantages(adv)

            def a_obj(p, actor=actor, obs=obs, actions=actions,
                      logp_old=logp_old, adv=adv):
                logp_new, entropy = actor.apply(
                    p, obs, actions, method=type(actor).logprob_entropy
                )
                return self._actor_surrogate(logp_new, logp_old, adv, adv_tot, entropy)

            def c_obj(p, critic=critic, obs=obs, returns=returns, v_old=v_old):
                v_new = critic.apply(p, obs)[..., 0]
                return ma_base.ppo_value_loss(
                    v_new, returns, v_old, cfg.algo.ratio_clip, cfg.algo.value_clip
                )

            for kind, obj, tx in ((f"actor{name}", a_obj, self.actor_tx),
                                  (f"critic{name}", c_obj, self.critic_tx)):
                loss, grads = jax.value_and_grad(obj)(params[kind])
                upd, opts[kind] = tx.update(grads, opts[kind], params[kind])
                params[kind] = optax.apply_updates(params[kind], upd)
                losses[kind] = loss

        def tot_obj(p):
            v_new = self.critic_tot.apply(p, obs_tot)[..., 0]
            return ma_base.ppo_value_loss(
                v_new, ret_tot, val_tot, cfg.algo.ratio_clip, cfg.algo.value_clip
            )

        loss, grads = jax.value_and_grad(tot_obj)(params["critic_tot"])
        upd, opts["critic_tot"] = self.critic_tx.update(
            grads, opts["critic_tot"], params["critic_tot"]
        )
        params["critic_tot"] = optax.apply_updates(params["critic_tot"], upd)
        losses["critic_tot"] = loss

        state = state.replace(params=params, opts=opts, update_count=state.update_count + 1)
        return state, losses

    def _train_iter(self, state: IPPOState):
        cfg = self.cfg
        rng, k_roll, k_perm = jax.random.split(state.rng, 3)
        state = state.replace(rng=rng)
        state, traj = self._rollout(state, k_roll)
        v_rms, data_r = self._agent_batch(state, traj, "right")
        v_rms_l, data_l = self._agent_batch(state, traj, "left")
        v_rms_tot, data_tot = self._tot_batch(state, traj)
        state = state.replace(
            value_rms=v_rms, value_rms_left=v_rms_l, value_rms_tot=v_rms_tot
        )

        def epoch(state, key):
            mb_r = ma_base.epoch_minibatches(key, data_r, cfg.algo.batch_size)
            mb_l = ma_base.epoch_minibatches(key, data_l, cfg.algo.batch_size)
            mb_t = ma_base.epoch_minibatches(key, data_tot, cfg.algo.batch_size)
            return jax.lax.scan(self._minibatch_update, state, (mb_r, mb_l, mb_t))

        keys = jax.random.split(k_perm, cfg.algo.update_times)
        state, losses = jax.lax.scan(lambda s, k: epoch(s, k), state, keys)
        metrics = {**ma_base.loss_metrics(losses), **state.stats.metrics()}
        return state, metrics


class QTOTV1(_QTOTBase):
    name = "QTOTV1"
    sum_advantages = True


class QTOTV2(_QTOTBase):
    name = "QTOTV2"
    sum_advantages = False
