"""Equivariant agent family (reference pql/algo/eq.py, eqs.py, eqg.py,
eqsc.py, eqsdata.py).

All are PPO-template agents whose networks exploit the task's C2 mirror
symmetry (JAX EMLPs from pql_tpu.models.emlp replacing escnn):

- **EQ**   — ONE equivariant actor + critic shared by both hands, applied
  to each hand's canonical-frame view (reference eq.py:26-42: actor_left
  is the same module).
- **EQS**  — separate equivariant actor/critic per hand with per-hand
  field types (reference eqs.py:27-36); honors same_policy like IPPO.
- **EQG**  — a single equivariant policy over the FULL system: standard
  PPO with an equivariant actor on the joint obs emitting the joint
  action (reference eqg.py:26-29 builds one actor+critic on the
  goal-conditioned view and steps the env with its raw action).
- **EQSC** — equivariant per-hand actors + ONE central invariant critic
  on the combined observation; a single shared advantage stream drives
  both hands' clipped losses (reference eqsc.py:27-31, 100-130,
  197-203).
- **EQSdata** — NON-equivariant networks + symmetry data augmentation:
  for every step, the group-transformed per-hand obs are pushed through
  the same policy/critic to synthesize a transformed trajectory stream
  (same rewards/dones), and updates run on the doubled batch (reference
  eqsdata.py:122-123, 128-131, 166-177, 239-258).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from typing import Any

from pql_tpu.algos import base, ma_base
from pql_tpu.algos.ippo import IPPO, IPPOState
from pql_tpu.algos.ppo import PPO
from pql_tpu.envs.base import VecEnv
from pql_tpu.models import get_model
from pql_tpu.ops import RunningMeanStd
from pql_tpu.utils.trackers import EpisodeStats


class EQ(IPPO):
    """Shared equivariant policy for both hands (reference eq.py)."""

    name = "EQ"
    same_policy = True


class EQS(IPPO):
    """Separate equivariant per-hand actors/critics (reference eqs.py)."""

    name = "EQS"


# ---------------------------------------------------------------------------
# EQG — single equivariant policy over the whole system
# ---------------------------------------------------------------------------


class EQG(PPO):
    """PPO with an equivariant actor/critic on the joint obs
    (reference eqg.py). The joint C2 rep is the direct sum of the
    per-hand reps (both for obs and actions)."""

    name = "EQG"

    def _build_models(self, cfg, env, rng):
        ma = ma_base.MultiAgentCtx(env)
        from pql_tpu.models.emlp import concat_reps

        dtype = base.compute_dtype(cfg)
        gen_obs = ma.joint_obs_gen()
        gen_act = concat_reps(ma.act_gen(), ma.act_gen())
        actor = get_model(cfg.algo.act_class)(gen_in=gen_obs, gen_out=gen_act, dtype=dtype)
        critic = get_model(cfg.algo.cri_class)(gen_in=gen_obs, dtype=dtype)
        k_a, k_c = jax.random.split(rng)
        dummy = jnp.zeros((1, env.obs_dim))
        actor_params = actor.init(k_a, dummy)
        critic_params = critic.init(k_c, dummy)
        actor_tx = base.build_optimizer(cfg.algo.actor_lr, cfg.algo.max_grad_norm)
        critic_tx = base.build_optimizer(cfg.algo.critic_lr, cfg.algo.max_grad_norm)
        return (
            actor, critic, actor_params, critic_params, actor_tx, critic_tx,
            actor_tx.init(actor_params), critic_tx.init(critic_params),
        )


# ---------------------------------------------------------------------------
# EQSC — per-hand equivariant actors + central invariant critic
# ---------------------------------------------------------------------------


@struct.dataclass
class EQSCState:
    params: dict[str, Any]
    opts: dict[str, Any]
    obs_rms: RunningMeanStd
    value_rms: RunningMeanStd
    env_state: Any
    obs: jax.Array
    dones: jax.Array
    stats: EpisodeStats
    rng: jax.Array
    env_steps: jax.Array
    update_count: jax.Array


class EQSC:
    name = "EQSC"

    def __init__(self, cfg, env: VecEnv):
        self.cfg = cfg
        self.env = env
        self.ma = ma_base.MultiAgentCtx(env)
        dtype = base.compute_dtype(cfg)
        self.actor = self.ma.make_actor(cfg, dtype, side=0)
        self.actor_left = self.ma.make_actor(cfg, dtype, side=1)
        # central critic on the combined obs (reference eqsc.py:30 builds
        # the critic on obs_dim[2], fed with ob_critic)
        self.critic = self.ma.make_critic(cfg, dtype, central=True)
        self.actor_tx = base.build_optimizer(cfg.algo.actor_lr, cfg.algo.max_grad_norm)
        self.critic_tx = base.build_optimizer(cfg.algo.critic_lr, cfg.algo.max_grad_norm)
        self.train_iter = jax.jit(self._train_iter)

    def init(self, rng) -> EQSCState:
        cfg, env = self.cfg, self.env
        k = jax.random.split(rng, 5)
        d_r, d_l = self.ma.obs_dims
        params = {
            "actor": self.actor.init(k[0], jnp.zeros((1, d_r))),
            "actor_left": self.actor_left.init(k[1], jnp.zeros((1, d_l))),
            "critic": self.critic.init(k[2], jnp.zeros((1, env.obs_dim))),
        }
        opts = {
            "actor": self.actor_tx.init(params["actor"]),
            "actor_left": self.actor_tx.init(params["actor_left"]),
            "critic": self.critic_tx.init(params["critic"]),
        }
        env_state, obs = env.reset(k[3])
        return EQSCState(
            params=params, opts=opts,
            obs_rms=RunningMeanStd.create((env.obs_dim,)),
            value_rms=RunningMeanStd.create((1,)),
            env_state=env_state, obs=obs,
            dones=jnp.zeros(env.num_envs, jnp.float32),
            stats=base.make_stats(cfg, env),
            rng=k[4],
            env_steps=jnp.zeros((), jnp.int32),
            update_count=jnp.zeros((), jnp.int32),
        )

    def _norm(self, obs_rms, obs):
        return obs_rms.normalize(obs) if self.cfg.algo.obs_norm else obs

    def _train_iter(self, state: EQSCState):
        cfg, env = self.cfg, self.env
        rng, k_roll, k_perm = jax.random.split(state.rng, 3)
        state = state.replace(rng=rng)

        # ------- rollout (eqsc.py:84-125): combined reward, central value
        def step_fn(carry, _):
            env_state, obs, dones, obs_rms, v_rms, stats, k = carry
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
                state.params["actor_left"], ob_l, k_l, method=type(self.actor_left).sample
            )
            value = self.critic.apply(state.params["critic"], obs_n)[..., 0]
            if cfg.algo.value_norm:
                v_rms = v_rms.update(value[:, None])
                value = v_rms.unnormalize(value[:, None])[:, 0]
            action = self.ma.merge_actions(act_r, act_l, tracker)
            env_state, next_obs, reward, done, info = env.step(env_state, action, k_e)
            rew_r, rew_l = self.ma.split_reward(info, tracker)
            stats = stats.update(rew_r + rew_l, done, info)
            out = dict(
                obs_r=ob_r, obs_l=ob_l, obs_critic=obs_n, dones=dones,
                act_r=act_r, act_l=act_l, logp_r=logp_r, logp_l=logp_l,
                reward=cfg.algo.reward_scale * (rew_r + rew_l), value=value,
                truncated=info["truncated"].astype(jnp.float32),
            )
            return (env_state, next_obs, done, obs_rms, v_rms, stats, k), out

        carry = (state.env_state, state.obs, state.dones, state.obs_rms,
                 state.value_rms, state.stats, k_roll)
        carry, traj = jax.lax.scan(step_fn, carry, None, length=cfg.algo.horizon_len)
        env_state, obs, dones, obs_rms, v_rms, stats, _ = carry
        state = state.replace(
            env_state=env_state, obs=obs, dones=dones, obs_rms=obs_rms,
            value_rms=v_rms, stats=stats,
            env_steps=state.env_steps + cfg.algo.horizon_len * env.num_envs,
        )

        # ------- single central GAE stream (eqsc.py:127-133)
        obs_n = self._norm(state.obs_rms, state.obs)
        next_value = self.critic.apply(state.params["critic"], obs_n)[..., 0]
        if cfg.algo.value_norm:
            v_rms = v_rms.update(next_value[:, None])
            next_value = v_rms.unnormalize(next_value[:, None])[:, 0]
        adv, ret = ma_base.gae(
            traj["reward"], traj["dones"], traj["value"], traj["truncated"],
            next_value, state.dones, cfg.algo.gamma, cfg.algo.lambda_gae_adv,
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
            f(traj["obs_r"]), f(traj["obs_l"]), f(traj["obs_critic"]),
            f(traj["act_r"]), f(traj["act_l"]), f(traj["logp_r"]), f(traj["logp_l"]),
            f(adv), b_ret, b_val,
        )

        # ------- update: both actors on the shared advantage (eqsc.py:197+)
        def minibatch_update(state, batch):
            (obs_r, obs_l, obs_c, act_r, act_l, logp_r, logp_l,
             adv, returns, v_old) = batch
            adv = ma_base.normalize_advantages(adv)
            params, opts = dict(state.params), dict(state.opts)

            def actor_obj(p, actor, o, a, lp):
                logp_new, entropy = actor.apply(
                    p, o, a, method=type(actor).logprob_entropy
                )
                return ma_base.ppo_actor_loss(
                    logp_new, lp, adv, entropy, cfg.algo.ratio_clip,
                    cfg.algo.lambda_entropy,
                )

            def critic_obj(p):
                v_new = self.critic.apply(p, obs_c)[..., 0]
                return ma_base.ppo_value_loss(
                    v_new, returns, v_old, cfg.algo.ratio_clip, cfg.algo.value_clip
                )

            a_loss, g = jax.value_and_grad(actor_obj)(
                params["actor"], self.actor, obs_r, act_r, logp_r
            )
            upd, opts["actor"] = self.actor_tx.update(g, opts["actor"], params["actor"])
            params["actor"] = optax.apply_updates(params["actor"], upd)

            a_loss_l, g = jax.value_and_grad(actor_obj)(
                params["actor_left"], self.actor_left, obs_l, act_l, logp_l
            )
            upd, opts["actor_left"] = self.actor_tx.update(
                g, opts["actor_left"], params["actor_left"]
            )
            params["actor_left"] = optax.apply_updates(params["actor_left"], upd)

            c_loss, g = jax.value_and_grad(critic_obj)(params["critic"])
            upd, opts["critic"] = self.critic_tx.update(g, opts["critic"], params["critic"])
            params["critic"] = optax.apply_updates(params["critic"], upd)

            state = state.replace(
                params=params, opts=opts, update_count=state.update_count + 1
            )
            return state, (c_loss, a_loss, a_loss_l)

        def epoch(state, key):
            mb = ma_base.epoch_minibatches(key, data, cfg.algo.batch_size)
            return jax.lax.scan(minibatch_update, state, mb)

        keys = jax.random.split(k_perm, cfg.algo.update_times)
        state, (c_losses, a_losses, a_losses_l) = jax.lax.scan(
            lambda s, k: epoch(s, k), state, keys
        )
        metrics = {
            "train/critic_loss": jnp.mean(c_losses),
            "train/actor_loss": jnp.mean(a_losses),
            "train/actor_loss_left": jnp.mean(a_losses_l),
            **state.stats.metrics(),
        }
        return state, metrics

    def eval_actor_apply(self, params, obs_n):
        ob_r, ob_l = self.ma.split_obs(obs_n, None)
        mean_r, _ = self.actor.apply(params["actor"], ob_r)
        mean_l, _ = self.actor_left.apply(params["actor_left"], ob_l)
        return self.ma.merge_actions(mean_r, mean_l, None)


# ---------------------------------------------------------------------------
# EQSdata — symmetry data augmentation with plain networks
# ---------------------------------------------------------------------------


class EQSdata(IPPO):
    """IPPO + symmetry data augmentation (reference eqsdata.py).

    After the real rollout, each hand's observation stream is transformed
    by the C2 generator and pushed through the same policy/critic to
    synthesize a second (transformed) stream with the SAME rewards and
    dones (reference eqsdata.py:122-131: ``transform_data`` + a second
    ``get_actions`` call per hand); updates run on the concatenated
    real+transformed batches (eqsdata.py:244-258).
    """

    name = "EQSdata"

    def __init__(self, cfg, env: VecEnv):
        super().__init__(cfg, env)
        if self.ma.eq is None:
            raise ValueError("EQSdata needs the task to provide an EquivarianceSpec")
        self._gen_r = jnp.asarray(np.asarray(self.ma.obs_gen(0), np.float32))
        self._gen_l = jnp.asarray(np.asarray(self.ma.obs_gen(1), np.float32))

    def _transformed_batch(self, state, traj, side: str, rng):
        """Synthesize the transformed stream for one hand: policy sampled
        on g·obs, critic evaluated on g·obs, rewards/dones reused."""
        cfg = self.cfg
        s = "r" if side == "right" else "l"
        gen = self._gen_r if side == "right" else self._gen_l
        actor = self.actor if side == "right" else self.actor_left
        critic = self.critic if side == "right" else self._left_module("critic")
        p_actor = state.params["actor"] if side == "right" else self._left(state.params, "actor")
        p_critic = (
            state.params["critic"] if side == "right" else self._left(state.params, "critic")
        )

        obs_t = traj[f"obs_{s}"] @ gen  # [T, E, d]
        T, E = obs_t.shape[:2]
        flat_obs = obs_t.reshape(T * E, -1)
        act_t, logp_t, _ = actor.apply(
            p_actor, flat_obs, rng, method=type(actor).sample
        )
        val_t = critic.apply(p_critic, flat_obs)[..., 0].reshape(T, E)
        value_rms = state.value_rms if side == "right" else state.value_rms_left
        if cfg.algo.value_norm:
            val_t = value_rms.unnormalize(val_t.reshape(-1, 1)).reshape(T, E)

        tracker = self.env.symmetry_tracker(state.env_state)
        obs_n = self._norm(state.obs_rms, state.obs)
        last_r, last_l = self.ma.split_obs(obs_n, tracker)
        last_t = (last_r if side == "right" else last_l) @ gen
        next_value = critic.apply(p_critic, last_t)[..., 0]
        if cfg.algo.value_norm:
            next_value = value_rms.unnormalize(next_value[:, None])[:, 0]

        adv, ret = ma_base.gae(
            traj[f"rew_{s}"], traj["dones"], val_t, traj["truncated"],
            next_value, state.dones, cfg.algo.gamma, cfg.algo.lambda_gae_adv,
            cfg.algo.use_gae,
        )
        f = ma_base.flat
        if cfg.algo.value_norm:
            b_ret = value_rms.normalize(ret.reshape(-1, 1))[:, 0]
            b_val = value_rms.normalize(val_t.reshape(-1, 1))[:, 0]
        else:
            b_ret, b_val = f(ret), f(val_t)
        return (flat_obs, act_t, logp_t, f(adv), b_ret, b_val)

    def _left_module(self, kind: str):
        return getattr(self, kind if self.same_policy else f"{kind}_left")

    def _train_iter(self, state: IPPOState):
        cfg = self.cfg
        rng, k_roll, k_perm, k_tr, k_tl = jax.random.split(state.rng, 5)
        state = state.replace(rng=rng)
        state, traj = self._rollout(state, k_roll)
        v_rms, data_r = self._agent_batch(state, traj, "right")
        v_rms_l, data_l = self._agent_batch(state, traj, "left")
        state = state.replace(value_rms=v_rms, value_rms_left=v_rms_l)
        data_rt = self._transformed_batch(state, traj, "right", k_tr)
        data_lt = self._transformed_batch(state, traj, "left", k_tl)
        # doubled batch: real ∥ transformed (eqsdata.py:244-249)
        data_r = tuple(jnp.concatenate([a, b], axis=0) for a, b in zip(data_r, data_rt))
        data_l = tuple(jnp.concatenate([a, b], axis=0) for a, b in zip(data_l, data_lt))

        def epoch(state, key):
            mb_r = ma_base.epoch_minibatches(key, data_r, cfg.algo.batch_size)
            mb_l = ma_base.epoch_minibatches(key, data_l, cfg.algo.batch_size)
            return jax.lax.scan(self._minibatch_update, state, (mb_r, mb_l))

        keys = jax.random.split(k_perm, cfg.algo.update_times)
        state, losses = jax.lax.scan(lambda s, k: epoch(s, k), state, keys)
        metrics = {
            "train/actor_loss": jnp.mean(losses["actor"]),
            "train/critic_loss": jnp.mean(losses["critic"]),
            **state.stats.metrics(),
        }
        if not self.same_policy:
            metrics["train/actor_loss_left"] = jnp.mean(losses["actor_left"])
            metrics["train/critic_loss_left"] = jnp.mean(losses["critic_left"])
        return state, metrics


class MP(IPPO):
    """Reference pql/algo/mp.py: structurally AgentIPPO with its own
    ``cfg.task.multi.MP`` spec block; here an IPPO variant registered
    under its own name for config parity."""

    name = "MP"


class EQS4(IPPO):
    """Four equivariant policies: right/left hands × normal/opposed
    frames (reference pql/algo/eqs4.py:29-44, 103-118). The opposed-frame
    views are the C2-transformed per-hand observations; each hand
    executes the MEAN of its normal-frame action and the back-transformed
    opposed-frame action (the in-repo analog of the bidex 4-way
    get_execute_action, eqs4.py:118), and all four actor/critic pairs
    train with PPO on their own stream (eqs4.py:154-163: four
    compute_adv streams with per-stream critics)."""

    name = "EQS4"

    def __init__(self, cfg, env: VecEnv):
        super().__init__(cfg, env)
        if self.ma.eq is None:
            raise ValueError("EQS4 needs the task to provide an EquivarianceSpec")
        dtype = base.compute_dtype(cfg)
        self.actor_op = self.ma.make_actor(cfg, dtype, side=0)
        self.actor_left_op = self.ma.make_actor(cfg, dtype, side=1)
        self.critic_op = self.ma.make_critic(cfg, dtype, side=0)
        self.critic_left_op = self.ma.make_critic(cfg, dtype, side=1)
        self._g_r = jnp.asarray(np.asarray(self.ma.obs_gen(0), np.float32))
        self._g_l = jnp.asarray(np.asarray(self.ma.obs_gen(1), np.float32))
        self._g_a = jnp.asarray(np.asarray(self.ma.act_gen(), np.float32))
        self.train_iter = jax.jit(self._train_iter)

    def _init_params(self, rng):
        k_base, k1, k2, k3, k4 = jax.random.split(rng, 5)
        params, opts = super()._init_params(k_base)
        d_r, d_l = self.ma.obs_dims
        params["actor_op"] = self.actor_op.init(k1, jnp.zeros((1, d_r)))
        params["actor_left_op"] = self.actor_left_op.init(k2, jnp.zeros((1, d_l)))
        params["critic_op"] = self.critic_op.init(k3, jnp.zeros((1, d_r)))
        params["critic_left_op"] = self.critic_left_op.init(k4, jnp.zeros((1, d_l)))
        for name in ("actor_op", "actor_left_op", "critic_op", "critic_left_op"):
            tx = self.actor_tx if name.startswith("actor") else self.critic_tx
            opts[name] = tx.init(params[name])
        return params, opts

    def _train_iter(self, state: IPPOState):
        cfg, env = self.cfg, self.env
        rng, k_roll, k_perm = jax.random.split(state.rng, 3)
        state = state.replace(rng=rng)

        def step_fn(carry, _):
            env_state, obs, dones, obs_rms, stats, k = carry
            k, k1, k2, k3, k4, k_e = jax.random.split(k, 6)
            tracker = env.symmetry_tracker(env_state)
            if cfg.algo.obs_norm:
                obs_rms = obs_rms.update(obs)
            obs_n = obs_rms.normalize(obs) if cfg.algo.obs_norm else obs
            ob_r, ob_l = self.ma.split_obs(obs_n, tracker)
            ob_r_op, ob_l_op = ob_r @ self._g_r, ob_l @ self._g_l
            p = state.params

            def act(actor, pp, o, kk):
                return actor.apply(pp, o, kk, method=type(actor).sample)

            a_r, lp_r, _ = act(self.actor, p["actor"], ob_r, k1)
            a_l, lp_l, _ = act(self.actor_left, p["actor_left"], ob_l, k2)
            a_op, lp_op, _ = act(self.actor_op, p["actor_op"], ob_r_op, k3)
            a_lop, lp_lop, _ = act(self.actor_left_op, p["actor_left_op"], ob_l_op, k4)
            v_r = self.critic.apply(p["critic"], ob_r)[..., 0]
            v_l = self.critic_left.apply(p["critic_left"], ob_l)[..., 0]
            v_op = self.critic_op.apply(p["critic_op"], ob_r_op)[..., 0]
            v_lop = self.critic_left_op.apply(p["critic_left_op"], ob_l_op)[..., 0]

            # ensemble execute: mean of normal and back-transformed opposed
            exec_r = 0.5 * (a_r + a_op @ self._g_a)
            exec_l = 0.5 * (a_l + a_lop @ self._g_a)
            action = self.ma.merge_actions(exec_r, exec_l, tracker)
            env_state, next_obs, reward, done, info = env.step(env_state, action, k_e)
            rew_r, rew_l = self.ma.split_reward(info, tracker)
            stats = stats.update(rew_r + rew_l, done, info)
            rs = cfg.algo.reward_scale
            out = dict(
                ob_r=ob_r, ob_l=ob_l, ob_r_op=ob_r_op, ob_l_op=ob_l_op,
                dones=dones,
                a_r=a_r, a_l=a_l, a_op=a_op, a_lop=a_lop,
                lp_r=lp_r, lp_l=lp_l, lp_op=lp_op, lp_lop=lp_lop,
                rew_r=rs * rew_r, rew_l=rs * rew_l,
                v_r=v_r, v_l=v_l, v_op=v_op, v_lop=v_lop,
                truncated=info["truncated"].astype(jnp.float32),
            )
            return (env_state, next_obs, done, obs_rms, stats, k), out

        carry = (state.env_state, state.obs, state.dones, state.obs_rms, state.stats, k_roll)
        carry, traj = jax.lax.scan(step_fn, carry, None, length=cfg.algo.horizon_len)
        env_state, obs, dones, obs_rms, stats, _ = carry
        state = state.replace(
            env_state=env_state, obs=obs, dones=dones, obs_rms=obs_rms, stats=stats,
            env_steps=state.env_steps + cfg.algo.horizon_len * env.num_envs,
        )

        obs_n = self._norm(state.obs_rms, state.obs)
        tracker = env.symmetry_tracker(state.env_state)
        ob_r, ob_l = self.ma.split_obs(obs_n, tracker)
        p = state.params
        streams = []
        for key, critic, pk, o_last, rew, val in (
            ("r", self.critic, "critic", ob_r, traj["rew_r"], traj["v_r"]),
            ("l", self.critic_left, "critic_left", ob_l, traj["rew_l"], traj["v_l"]),
            ("op", self.critic_op, "critic_op", ob_r @ self._g_r, traj["rew_r"], traj["v_op"]),
            ("lop", self.critic_left_op, "critic_left_op", ob_l @ self._g_l,
             traj["rew_l"], traj["v_lop"]),
        ):
            nv = critic.apply(p[pk], o_last)[..., 0]
            adv, ret = ma_base.gae(
                rew, traj["dones"], val, traj["truncated"], nv, state.dones,
                cfg.algo.gamma, cfg.algo.lambda_gae_adv, cfg.algo.use_gae,
            )
            streams.append((adv, ret))

        f = ma_base.flat
        data = (
            f(traj["ob_r"]), f(traj["a_r"]), f(traj["lp_r"]), f(streams[0][0]),
            f(streams[0][1]), f(traj["v_r"]),
            f(traj["ob_l"]), f(traj["a_l"]), f(traj["lp_l"]), f(streams[1][0]),
            f(streams[1][1]), f(traj["v_l"]),
            f(traj["ob_r_op"]), f(traj["a_op"]), f(traj["lp_op"]), f(streams[2][0]),
            f(streams[2][1]), f(traj["v_op"]),
            f(traj["ob_l_op"]), f(traj["a_lop"]), f(traj["lp_lop"]), f(streams[3][0]),
            f(streams[3][1]), f(traj["v_lop"]),
        )

        def minibatch_update(state, batch):
            params, opts = dict(state.params), dict(state.opts)
            losses = {}
            groups = (
                ("actor", "critic", self.actor, self.critic, batch[0:6]),
                ("actor_left", "critic_left", self.actor_left, self.critic_left, batch[6:12]),
                ("actor_op", "critic_op", self.actor_op, self.critic_op, batch[12:18]),
                ("actor_left_op", "critic_left_op", self.actor_left_op,
                 self.critic_left_op, batch[18:24]),
            )
            for a_name, c_name, actor, critic, (o, a, lp, ad, rt, v) in groups:
                advn = ma_base.normalize_advantages(ad)

                def a_obj(pp, actor=actor, o=o, a=a, lp=lp, advn=advn):
                    lpn, ent = actor.apply(pp, o, a, method=type(actor).logprob_entropy)
                    return ma_base.ppo_actor_loss(
                        lpn, lp, advn, ent, cfg.algo.ratio_clip, cfg.algo.lambda_entropy
                    )

                def c_obj(pp, critic=critic, o=o, rt=rt, v=v):
                    vn = critic.apply(pp, o)[..., 0]
                    return ma_base.ppo_value_loss(
                        vn, rt, v, cfg.algo.ratio_clip, cfg.algo.value_clip
                    )

                for kind, obj, tx in ((a_name, a_obj, self.actor_tx),
                                      (c_name, c_obj, self.critic_tx)):
                    loss, grads = jax.value_and_grad(obj)(params[kind])
                    upd, opts[kind] = tx.update(grads, opts[kind], params[kind])
                    params[kind] = optax.apply_updates(params[kind], upd)
                    losses[kind] = loss
            state = state.replace(params=params, opts=opts,
                                  update_count=state.update_count + 1)
            return state, losses

        def epoch(state, key):
            mb = ma_base.epoch_minibatches(key, data, cfg.algo.batch_size)
            return jax.lax.scan(minibatch_update, state, mb)

        keys = jax.random.split(k_perm, cfg.algo.update_times)
        state, losses = jax.lax.scan(lambda s, k: epoch(s, k), state, keys)
        return state, {**ma_base.loss_metrics(losses), **state.stats.metrics()}

    def eval_actor_apply(self, params, obs_n):
        ob_r, ob_l = self.ma.split_obs(obs_n, None)
        m_r, _ = self.actor.apply(params["actor"], ob_r)
        m_l, _ = self.actor_left.apply(params["actor_left"], ob_l)
        m_op, _ = self.actor_op.apply(params["actor_op"], ob_r @ self._g_r)
        m_lop, _ = self.actor_left_op.apply(params["actor_left_op"], ob_l @ self._g_l)
        exec_r = 0.5 * (m_r + m_op @ self._g_a)
        exec_l = 0.5 * (m_l + m_lop @ self._g_a)
        return self.ma.merge_actions(exec_r, exec_l, None)
