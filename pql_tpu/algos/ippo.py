"""IPPO — independent PPO per hand (reference pql/algo/ippo.py).

Two actors + two critics, one per hand, each trained by PPO on its own
per-hand observation slice and reward channel (split from the named terms
in ``info['detailed_reward']``); optional weight sharing collapses both
hands onto one actor/critic pair updated on the summed losses
(``same_policy``, reference ippo.py:35-39, 250-256).

The whole iteration (rollout → per-hand GAE → update_times epochs of
clipped updates for both hands) compiles into one XLA program.

Note: the reference's obs-norm branch inside update_net is broken (it
normalizes the right obs but leaves ``obs_left`` undefined unless
obs_norm=False, reference ippo.py:202-206) — these agents effectively run
un-normalized. Here obs_norm works: a joint-obs RunningMeanStd is updated
during rollout and per-hand views are sliced from the *normalized* joint
obs (slicing commutes with elementwise normalization).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pql_tpu.algos import base, ma_base
from pql_tpu.envs.base import VecEnv
from pql_tpu.ops import RunningMeanStd
from pql_tpu.utils.trackers import EpisodeStats


@struct.dataclass
class IPPOState:
    params: dict[str, Any]  # actor/critic[(_left)] param trees
    opts: dict[str, Any]
    obs_rms: RunningMeanStd  # joint obs
    value_rms: RunningMeanStd
    value_rms_left: RunningMeanStd
    env_state: Any
    obs: jax.Array
    dones: jax.Array
    stats: EpisodeStats
    rng: jax.Array
    env_steps: jax.Array
    update_count: jax.Array
    # optional third value-rms for the QTOT total-critic stream
    value_rms_tot: RunningMeanStd | None = None


class IPPO:
    name = "IPPO"
    same_policy = False  # subclass hook (reference cfg.task.multi.same_policy)

    def __init__(self, cfg, env: VecEnv):
        self.cfg = cfg
        self.env = env
        self.ma = ma_base.MultiAgentCtx(env)
        if getattr(cfg.algo, "same_policy", False):
            self.same_policy = True
        if self.same_policy and self.ma.obs_dims[0] != self.ma.obs_dims[1]:
            raise ValueError("same_policy requires equal per-hand obs dims")

        dtype = base.compute_dtype(cfg)
        self.actor = self.ma.make_actor(cfg, dtype, side=0)
        self.actor_left = (
            self.actor if self.same_policy else self.ma.make_actor(cfg, dtype, side=1)
        )
        self.critic = self.ma.make_critic(cfg, dtype, side=0)
        self.critic_left = (
            self.critic if self.same_policy else self.ma.make_critic(cfg, dtype, side=1)
        )

        self.actor_tx = base.build_optimizer(cfg.algo.actor_lr, cfg.algo.max_grad_norm)
        self.critic_tx = base.build_optimizer(cfg.algo.critic_lr, cfg.algo.max_grad_norm)

        buffer_size = cfg.algo.horizon_len * cfg.num_envs
        if buffer_size % cfg.algo.batch_size:
            raise ValueError(
                f"horizon_len*num_envs={buffer_size} must be divisible by "
                f"batch_size={cfg.algo.batch_size}"
            )
        self.train_iter = jax.jit(self._train_iter)

    # ------------------------------------------------------------------ init

    def _init_params(self, rng):
        k = jax.random.split(rng, 4)
        d_r, d_l = self.ma.obs_dims
        params = {
            "actor": self.actor.init(k[0], jnp.zeros((1, d_r))),
            "critic": self.critic.init(k[1], jnp.zeros((1, d_r))),
        }
        if not self.same_policy:
            params["actor_left"] = self.actor_left.init(k[2], jnp.zeros((1, d_l)))
            params["critic_left"] = self.critic_left.init(k[3], jnp.zeros((1, d_l)))
        opts = {
            name: (self.actor_tx if name.startswith("actor") else self.critic_tx).init(p)
            for name, p in params.items()
        }
        return params, opts

    def init(self, rng) -> IPPOState:
        cfg, env = self.cfg, self.env
        k_p, k_env, k_loop = jax.random.split(rng, 3)
        params, opts = self._init_params(k_p)
        env_state, obs = env.reset(k_env)
        return IPPOState(
            params=params,
            opts=opts,
            obs_rms=RunningMeanStd.create((env.obs_dim,)),
            value_rms=RunningMeanStd.create((1,)),
            value_rms_left=RunningMeanStd.create((1,)),
            env_state=env_state,
            obs=obs,
            dones=jnp.zeros(env.num_envs, jnp.float32),
            stats=base.make_stats(cfg, env),
            rng=k_loop,
            env_steps=jnp.zeros((), jnp.int32),
            update_count=jnp.zeros((), jnp.int32),
        )

    def _left(self, params: dict, kind: str):
        return params[kind] if self.same_policy else params[f"{kind}_left"]

    # --------------------------------------------------------------- rollout

    def _norm(self, obs_rms, obs):
        return obs_rms.normalize(obs) if self.cfg.algo.obs_norm else obs

    def _value(self, critic, params, obs_n, value_rms):
        """Critic forward with the reference's value-norm bookkeeping
        (ippo.py:53-57): update rms on raw value, return unnormalized."""
        v = critic.apply(params, obs_n)[..., 0]
        if self.cfg.algo.value_norm:
            value_rms = value_rms.update(v[:, None])
            v = value_rms.unnormalize(v[:, None])[:, 0]
        return v, value_rms

    def _extra_step_fields(self, state, obs_n, rew_r, rew_l) -> dict:
        """Per-step rollout extension hook (QTOT variants add the total
        critic's value and the combined reward stream)."""
        return {}

    def _rollout(self, state: IPPOState, rng):
        cfg, env = self.cfg, self.env

        def step_fn(carry, _):
            env_state, obs, dones, obs_rms, v_rms, v_rms_l, stats, k = carry
            k, k_r, k_l, k_e = jax.random.split(k, 4)
            tracker = env.symmetry_tracker(env_state)
            if cfg.algo.obs_norm:
                obs_rms = obs_rms.update(obs)
            obs_n = self._norm(obs_rms, obs)
            ob_r, ob_l = self.ma.split_obs(obs_n, tracker)

            act_r, logp_r, _ = self.actor.apply(
                state.params["actor"], ob_r, k_r, method=type(self.actor).sample
            )
            act_l, logp_l, _ = self.actor_left.apply(
                self._left(state.params, "actor"), ob_l, k_l,
                method=type(self.actor_left).sample,
            )
            val_r, v_rms = self._value(self.critic, state.params["critic"], ob_r, v_rms)
            val_l, v_rms_l = self._value(
                self.critic_left, self._left(state.params, "critic"), ob_l, v_rms_l
            )
            action = self.ma.merge_actions(act_r, act_l, tracker)
            env_state, next_obs, reward, done, info = env.step(env_state, action, k_e)
            rew_r, rew_l = self.ma.split_reward(info, tracker)
            stats = stats.update(rew_r + rew_l, done, info)
            out = dict(
                obs_r=ob_r, obs_l=ob_l, dones=dones,
                act_r=act_r, act_l=act_l, logp_r=logp_r, logp_l=logp_l,
                rew_r=cfg.algo.reward_scale * rew_r,
                rew_l=cfg.algo.reward_scale * rew_l,
                val_r=val_r, val_l=val_l,
                truncated=info["truncated"].astype(jnp.float32),
            )
            out.update(self._extra_step_fields(state, obs_n, rew_r, rew_l))
            return (env_state, next_obs, done, obs_rms, v_rms, v_rms_l, stats, k), out

        carry = (
            state.env_state, state.obs, state.dones, state.obs_rms,
            state.value_rms, state.value_rms_left, state.stats, rng,
        )
        carry, traj = jax.lax.scan(step_fn, carry, None, length=cfg.algo.horizon_len)
        env_state, obs, dones, obs_rms, v_rms, v_rms_l, stats, _ = carry
        state = state.replace(
            env_state=env_state, obs=obs, dones=dones, obs_rms=obs_rms,
            value_rms=v_rms, value_rms_left=v_rms_l, stats=stats,
            env_steps=state.env_steps + cfg.algo.horizon_len * env.num_envs,
        )
        return state, traj

    # ------------------------------------------------------------- advantage

    def _agent_batch(self, state, traj, side: str):
        """GAE + flattening for one hand (reference compute_adv,
        ippo.py:124-183). Returns (value_rms, (obs, act, logp, adv, ret, val))."""
        cfg = self.cfg
        s = "r" if side == "right" else "l"
        tracker = self.env.symmetry_tracker(state.env_state)
        obs_n = self._norm(state.obs_rms, state.obs)
        ob_r, ob_l = self.ma.split_obs(obs_n, tracker)
        last_obs = ob_r if side == "right" else ob_l
        critic = self.critic if side == "right" else self.critic_left
        params = (
            state.params["critic"] if side == "right" else self._left(state.params, "critic")
        )
        value_rms = state.value_rms if side == "right" else state.value_rms_left
        next_value, value_rms = self._value(critic, params, last_obs, value_rms)

        adv, ret = ma_base.gae(
            traj[f"rew_{s}"], traj["dones"], traj[f"val_{s}"], traj["truncated"],
            next_value, state.dones, cfg.algo.gamma, cfg.algo.lambda_gae_adv,
            cfg.algo.use_gae,
        )
        f = ma_base.flat
        if cfg.algo.value_norm:
            value_rms = value_rms.update(ret.reshape(-1, 1))
            b_ret = value_rms.normalize(ret.reshape(-1, 1))[:, 0]
            value_rms = value_rms.update(traj[f"val_{s}"].reshape(-1, 1))
            b_val = value_rms.normalize(traj[f"val_{s}"].reshape(-1, 1))[:, 0]
        else:
            b_ret, b_val = f(ret), f(traj[f"val_{s}"])
        data = (f(traj[f"obs_{s}"]), f(traj[f"act_{s}"]), f(traj[f"logp_{s}"]), f(adv), b_ret, b_val)
        return value_rms, data

    # ---------------------------------------------------------------- update

    def _losses(self, params, batch_r, batch_l):
        """Per-hand clipped losses (reference ippo.py:207-248)."""
        cfg = self.cfg

        def one(actor, critic, p_actor, p_critic, batch):
            obs, actions, logp_old, adv, returns, v_old = batch
            adv = ma_base.normalize_advantages(adv)
            logp_new, entropy = actor.apply(
                p_actor, obs, actions, method=type(actor).logprob_entropy
            )
            a_loss = ma_base.ppo_actor_loss(
                logp_new, logp_old, adv, entropy, cfg.algo.ratio_clip,
                cfg.algo.lambda_entropy,
            )
            v_new = critic.apply(p_critic, obs)[..., 0]
            c_loss = ma_base.ppo_value_loss(
                v_new, returns, v_old, cfg.algo.ratio_clip, cfg.algo.value_clip
            )
            return a_loss, c_loss

        a_r, c_r = one(self.actor, self.critic, params["actor"], params["critic"], batch_r)
        a_l, c_l = one(
            self.actor_left, self.critic_left,
            self._left(params, "actor"), self._left(params, "critic"), batch_l,
        )
        return a_r, c_r, a_l, c_l

    def _minibatch_update(self, state: IPPOState, batches):
        batch_r, batch_l = batches
        params, opts = dict(state.params), dict(state.opts)

        if self.same_policy:
            # joint update on summed losses (reference ippo.py:250-256)
            def actor_obj(p_actor):
                p = {**params, "actor": p_actor}
                a_r, _, a_l, _ = self._losses(p, batch_r, batch_l)
                return a_r + a_l

            def critic_obj(p_critic):
                p = {**params, "critic": p_critic}
                _, c_r, _, c_l = self._losses(p, batch_r, batch_l)
                return c_r + c_l

            updates_spec = [("actor", actor_obj, self.actor_tx), ("critic", critic_obj, self.critic_tx)]
        else:
            def make_obj(name, idx):
                def obj(p_one):
                    p = {**params, name: p_one}
                    return self._losses(p, batch_r, batch_l)[idx]
                return obj

            updates_spec = [
                ("actor", make_obj("actor", 0), self.actor_tx),
                ("critic", make_obj("critic", 1), self.critic_tx),
                ("actor_left", make_obj("actor_left", 2), self.actor_tx),
                ("critic_left", make_obj("critic_left", 3), self.critic_tx),
            ]

        losses = {}
        for name, obj, tx in updates_spec:
            loss, grads = jax.value_and_grad(obj)(params[name])
            upd, opts[name] = tx.update(grads, state.opts[name], params[name])
            params[name] = optax.apply_updates(params[name], upd)
            losses[name] = loss
        state = state.replace(
            params=params, opts=opts, update_count=state.update_count + 1
        )
        return state, losses

    def _train_iter(self, state: IPPOState):
        cfg = self.cfg
        rng, k_roll, k_perm = jax.random.split(state.rng, 3)
        state = state.replace(rng=rng)
        state, traj = self._rollout(state, k_roll)
        v_rms, data_r = self._agent_batch(state, traj, "right")
        v_rms_l, data_l = self._agent_batch(state, traj, "left")
        state = state.replace(value_rms=v_rms, value_rms_left=v_rms_l)

        def epoch(state, key):
            mb_r = ma_base.epoch_minibatches(key, data_r, cfg.algo.batch_size)
            mb_l = ma_base.epoch_minibatches(key, data_l, cfg.algo.batch_size)
            return jax.lax.scan(self._minibatch_update, state, (mb_r, mb_l))

        keys = jax.random.split(k_perm, cfg.algo.update_times)
        state, losses = jax.lax.scan(lambda s, k: epoch(s, k), state, keys)
        metrics = {**ma_base.loss_metrics(losses), **state.stats.metrics()}
        return state, metrics

    # ------------------------------------------------------------- eval hook

    def eval_actor_apply(self, params, obs_n):
        """Deterministic joint action from the per-hand mean policies."""
        ob_r, ob_l = self.ma.split_obs(obs_n, None)
        mean_r, _ = self.actor.apply(params["actor"], ob_r)
        mean_l, _ = self.actor_left.apply(self._left(params, "actor"), ob_l)
        return self.ma.merge_actions(mean_r, mean_l, None)

    @property
    def eval_params_of(self):
        return lambda state: state.params
