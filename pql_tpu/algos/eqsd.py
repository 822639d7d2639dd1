"""Team-distillation agents (reference pql/algo/eqsd.py, eqsd2.py).

- **EQSD**: per-hand PPO (the IPPO/EQS template) plus a JOINT team actor
  on the combined observation trained by imitation of the executed
  per-hand actions — either a diffusion policy (ε-MSE ``get_loss``) or a
  Gaussian policy (−log π_team(a_joint | s_joint)) (reference
  eqsd.py:29-33, 246-251, 288-291).
- **EQSD2**: split-population training — the first half of the envs is
  driven by the independent per-hand actors, the second half by the team
  actor; the team actor is trained with PPO on its own stream PLUS a
  linearly-scheduled KL(independent ‖ team) term evaluated on the
  independent half's state-actions (reference eqsd2.py:181-203, 384-432;
  kl weight from LinearSchedule kl_max→kl_min, eqsd2.py:55-58).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pql_tpu.algos import base, ma_base
from pql_tpu.algos.ippo import IPPO, IPPOState
from pql_tpu.envs.base import VecEnv
from pql_tpu.models import get_model
from pql_tpu.models.ediffusion import EquivariantDiffusionPolicy
from pql_tpu.models.diffusion import StateDiffusionPolicy
from pql_tpu.models.emlp import concat_reps
from pql_tpu.ops import LinearSchedule, RunningMeanStd
from pql_tpu.utils.trackers import EpisodeStats


class EQSD(IPPO):
    name = "EQSD"

    def __init__(self, cfg, env: VecEnv):
        super().__init__(cfg, env)
        joint_obs_dim = self.ma.obs_dims[0] + self.ma.obs_dims[1]
        joint_act_dim = 2 * self.ma.action_dim
        dtype = base.compute_dtype(cfg)
        equivariant = "Equivariant" in cfg.algo.act_class and self.ma.eq is not None
        if cfg.algo.diffusion:
            # reference eqsd.py:31: EquivariantDiffusionPolicy team actor
            if equivariant:
                self.actor_team = EquivariantDiffusionPolicy(
                    gen_obs=self.ma.joint_obs_gen(),
                    gen_act=concat_reps(self.ma.act_gen(), self.ma.act_gen()),
                    diffusion_iter=cfg.algo.diffusion_iter,
                    dtype=dtype,
                )
            else:
                self.actor_team = StateDiffusionPolicy(
                    action_dim=joint_act_dim,
                    diffusion_iter=cfg.algo.diffusion_iter,
                    dtype=dtype,
                )
        else:
            if equivariant:
                self.actor_team = get_model("DiagGaussianEquivariantMLPPolicy")(
                    gen_in=self.ma.joint_obs_gen(),
                    gen_out=concat_reps(self.ma.act_gen(), self.ma.act_gen()),
                    dtype=dtype,
                )
            else:
                self.actor_team = get_model("DiagGaussianMLPPolicy")(
                    act_dim=joint_act_dim, dtype=dtype
                )
        self._joint_obs_dim = joint_obs_dim
        self._joint_act_dim = joint_act_dim
        # re-jit: _minibatch_update changed shape (team stream)
        self.train_iter = jax.jit(self._train_iter)

    def _init_params(self, rng):
        k_base, k_team, k_rng = jax.random.split(rng, 3)
        params, opts = super()._init_params(k_base)
        dummy_obs = jnp.zeros((1, self._joint_obs_dim))
        if self.cfg.algo.diffusion:
            params["actor_team"] = self.actor_team.init(
                k_team, dummy_obs, jnp.zeros((1, self._joint_act_dim)), k_rng,
                method=type(self.actor_team).get_loss,
            )
        else:
            params["actor_team"] = self.actor_team.init(k_team, dummy_obs)
        opts["actor_team"] = self.actor_tx.init(params["actor_team"])
        return params, opts

    def _minibatch_update(self, state: IPPOState, batches):
        """Per-hand PPO step + team imitation step (eqsd.py:246-291)."""
        state, losses = super()._minibatch_update(state, batches)
        batch_r, batch_l = batches
        obs_combine = jnp.concatenate([batch_r[0], batch_l[0]], axis=-1)
        act_combine = jnp.concatenate([batch_r[1], batch_l[1]], axis=-1)
        rng, k = jax.random.split(state.rng)

        if self.cfg.algo.diffusion:
            act_combine = jnp.clip(act_combine, -1.0, 1.0)  # eqsd.py:206

            def team_obj(p):
                return self.actor_team.apply(
                    p, obs_combine, act_combine, k,
                    method=type(self.actor_team).get_loss,
                )
        else:

            def team_obj(p):
                logp, _ = self.actor_team.apply(
                    p, obs_combine, act_combine,
                    method=type(self.actor_team).logprob_entropy,
                )
                return -jnp.mean(logp)

        loss, grads = jax.value_and_grad(team_obj)(state.params["actor_team"])
        params, opts = dict(state.params), dict(state.opts)
        upd, opts["actor_team"] = self.actor_tx.update(
            grads, opts["actor_team"], params["actor_team"]
        )
        params["actor_team"] = optax.apply_updates(params["actor_team"], upd)
        losses["actor_team"] = loss
        return state.replace(params=params, opts=opts, rng=rng), losses


class EQSD2:
    """Split-population team distillation (reference eqsd2.py)."""

    name = "EQSD2"

    def __init__(self, cfg, env: VecEnv):
        if env.num_envs % 2:
            raise ValueError("EQSD2 needs an even num_envs (half ind / half team)")
        self.cfg = cfg
        self.env = env
        self.ma = ma_base.MultiAgentCtx(env)
        self.half = env.num_envs // 2
        dtype = base.compute_dtype(cfg)
        self.actor = self.ma.make_actor(cfg, dtype, side=0)
        self.actor_left = self.ma.make_actor(cfg, dtype, side=1)
        self.critic = self.ma.make_critic(cfg, dtype, side=0)
        self.critic_left = self.ma.make_critic(cfg, dtype, side=1)
        equivariant = "Equivariant" in cfg.algo.act_class and self.ma.eq is not None
        joint_act = 2 * self.ma.action_dim
        if equivariant:
            self.actor_team = get_model("DiagGaussianEquivariantMLPPolicy")(
                gen_in=self.ma.joint_obs_gen(),
                gen_out=concat_reps(self.ma.act_gen(), self.ma.act_gen()),
                dtype=dtype,
            )
            self.critic_team = self.ma.make_critic(cfg, dtype, central=True)
        else:
            self.actor_team = get_model("DiagGaussianMLPPolicy")(
                act_dim=joint_act, dtype=dtype
            )
            self.critic_team = get_model(cfg.algo.cri_class)(dtype=dtype)
        self.actor_tx = base.build_optimizer(cfg.algo.actor_lr, cfg.algo.max_grad_norm)
        self.critic_tx = base.build_optimizer(cfg.algo.critic_lr, cfg.algo.max_grad_norm)
        self.kl_schedule = LinearSchedule(cfg.algo.kl_max, 0.0, cfg.algo.kl_decay_iters)
        self.train_iter = jax.jit(self._train_iter)

    def init(self, rng):
        cfg, env = self.cfg, self.env
        k = jax.random.split(rng, 8)
        d_r, d_l = self.ma.obs_dims
        joint = d_r + d_l
        params = {
            "actor": self.actor.init(k[0], jnp.zeros((1, d_r))),
            "actor_left": self.actor_left.init(k[1], jnp.zeros((1, d_l))),
            "critic": self.critic.init(k[2], jnp.zeros((1, d_r))),
            "critic_left": self.critic_left.init(k[3], jnp.zeros((1, d_l))),
            "actor_team": self.actor_team.init(k[4], jnp.zeros((1, joint))),
            "critic_team": self.critic_team.init(k[5], jnp.zeros((1, joint))),
        }
        opts = {
            name: (self.actor_tx if name.startswith("actor") else self.critic_tx).init(p)
            for name, p in params.items()
        }
        env_state, obs = env.reset(k[6])
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
            rng=k[7],
            env_steps=jnp.zeros((), jnp.int32),
            update_count=jnp.zeros((), jnp.int32),
        )

    def _norm(self, obs_rms, obs):
        return obs_rms.normalize(obs) if self.cfg.algo.obs_norm else obs

    def _train_iter(self, state: IPPOState):
        cfg, env, half = self.cfg, self.env, self.half
        rng, k_roll, k_perm = jax.random.split(state.rng, 3)
        state = state.replace(rng=rng)

        # ---- rollout: env [0:half) independent hands, [half:) team actor
        # (reference eqsd2.py:181-203)
        def step_fn(carry, _):
            env_state, obs, dones, obs_rms, stats, k = carry
            k, k_r, k_l, k_t, k_e = jax.random.split(k, 5)
            tracker = env.symmetry_tracker(env_state)
            if cfg.algo.obs_norm:
                obs_rms = obs_rms.update(obs)
            obs_n = self._norm(obs_rms, obs)
            ob_r, ob_l = self.ma.split_obs(obs_n, tracker)
            ob_team = jnp.concatenate([ob_r, ob_l], axis=-1)  # [E, joint]

            act_r, logp_r, _ = self.actor.apply(
                state.params["actor"], ob_r[:half], k_r, method=type(self.actor).sample
            )
            act_l, logp_l, _ = self.actor_left.apply(
                state.params["actor_left"], ob_l[:half], k_l,
                method=type(self.actor_left).sample,
            )
            act_team, logp_team, _ = self.actor_team.apply(
                state.params["actor_team"], ob_team[half:], k_t,
                method=type(self.actor_team).sample,
            )
            # team actor's log-prob of the INDEPENDENT joint action (for KL)
            a = self.ma.action_dim
            act_ind = jnp.concatenate([act_r, act_l], axis=-1)
            logp_ind_side, _ = self.actor_team.apply(
                state.params["actor_team"], ob_team[:half], act_ind,
                method=type(self.actor_team).logprob_entropy,
            )

            val_r = self.critic.apply(state.params["critic"], ob_r[:half])[..., 0]
            val_l = self.critic_left.apply(state.params["critic_left"], ob_l[:half])[..., 0]
            val_team = self.critic_team.apply(state.params["critic_team"], ob_team[half:])[..., 0]

            # execute: ind actions in first half, team action split in second
            exec_first = self.ma.merge_actions(act_r, act_l, None)
            exec_second = jnp.concatenate([act_team[:, :a], act_team[:, a:]], axis=-1)
            action = jnp.concatenate([exec_first, exec_second], axis=0)
            env_state, next_obs, reward, done, info = env.step(env_state, action, k_e)
            rew_r, rew_l = self.ma.split_reward(info, tracker)
            stats = stats.update(rew_r + rew_l, done, info)
            out = dict(
                obs_r=ob_r[:half], obs_l=ob_l[:half],
                obs_team=ob_team[half:], obs_ind_side=ob_team[:half],
                dones_ind=dones[:half], dones_team=dones[half:],
                act_r=act_r, act_l=act_l, act_team=act_team, act_ind=act_ind,
                logp_r=logp_r, logp_l=logp_l, logp_team=logp_team,
                logp_ind_side=logp_ind_side,
                rew_r=cfg.algo.reward_scale * rew_r[:half],
                rew_l=cfg.algo.reward_scale * rew_l[:half],
                rew_team=cfg.algo.reward_scale * (rew_r + rew_l)[half:],
                val_r=val_r, val_l=val_l, val_team=val_team,
                trunc_ind=info["truncated"][:half].astype(jnp.float32),
                trunc_team=info["truncated"][half:].astype(jnp.float32),
            )
            return (env_state, next_obs, done, obs_rms, stats, k), out

        carry = (state.env_state, state.obs, state.dones, state.obs_rms, state.stats, k_roll)
        carry, traj = jax.lax.scan(step_fn, carry, None, length=cfg.algo.horizon_len)
        env_state, obs, dones, obs_rms, stats, _ = carry
        state = state.replace(
            env_state=env_state, obs=obs, dones=dones, obs_rms=obs_rms, stats=stats,
            env_steps=state.env_steps + cfg.algo.horizon_len * env.num_envs,
        )

        # ---- GAE per stream
        obs_n = self._norm(state.obs_rms, state.obs)
        tracker = env.symmetry_tracker(state.env_state)
        ob_r, ob_l = self.ma.split_obs(obs_n, tracker)
        ob_team = jnp.concatenate([ob_r, ob_l], axis=-1)
        nv_r = self.critic.apply(state.params["critic"], ob_r[:half])[..., 0]
        nv_l = self.critic_left.apply(state.params["critic_left"], ob_l[:half])[..., 0]
        nv_t = self.critic_team.apply(state.params["critic_team"], ob_team[half:])[..., 0]

        g = lambda rew, don, val, trc, nv, nd: ma_base.gae(
            rew, don, val, trc, nv, nd, cfg.algo.gamma, cfg.algo.lambda_gae_adv,
            cfg.algo.use_gae,
        )
        adv_r, ret_r = g(traj["rew_r"], traj["dones_ind"], traj["val_r"],
                         traj["trunc_ind"], nv_r, state.dones[:half])
        adv_l, ret_l = g(traj["rew_l"], traj["dones_ind"], traj["val_l"],
                         traj["trunc_ind"], nv_l, state.dones[:half])
        adv_t, ret_t = g(traj["rew_team"], traj["dones_team"], traj["val_team"],
                         traj["trunc_team"], nv_t, state.dones[half:])

        f = ma_base.flat
        data = (
            f(traj["obs_r"]), f(traj["act_r"]), f(traj["logp_r"]), f(adv_r),
            f(ret_r), f(traj["val_r"]),
            f(traj["obs_l"]), f(traj["act_l"]), f(traj["logp_l"]), f(adv_l),
            f(ret_l), f(traj["val_l"]),
            f(traj["obs_team"]), f(traj["act_team"]), f(traj["logp_team"]), f(adv_t),
            f(ret_t), f(traj["val_team"]),
            f(traj["obs_ind_side"]), f(traj["act_ind"]), f(traj["logp_ind_side"]),
        )

        kl_weight = self.kl_schedule(state.update_count)

        def minibatch_update(state, batch):
            (o_r, a_r, lp_r, ad_r, rt_r, v_r,
             o_l, a_l, lp_l, ad_l, rt_l, v_l,
             o_t, a_t, lp_t, ad_t, rt_t, v_t,
             o_is, a_is, lp_is) = batch
            params, opts = dict(state.params), dict(state.opts)

            def ppo_pair(actor, critic, o, a, lp, ad, rt, v):
                ad = ma_base.normalize_advantages(ad)

                def a_obj(p):
                    lpn, ent = actor.apply(p, o, a, method=type(actor).logprob_entropy)
                    return ma_base.ppo_actor_loss(
                        lpn, lp, ad, ent, cfg.algo.ratio_clip, cfg.algo.lambda_entropy
                    )

                def c_obj(p):
                    vn = critic.apply(p, o)[..., 0]
                    return ma_base.ppo_value_loss(
                        vn, rt, v, cfg.algo.ratio_clip, cfg.algo.value_clip
                    )

                return a_obj, c_obj

            losses = {}
            for name, actor, critic, args in (
                ("", self.actor, self.critic, (o_r, a_r, lp_r, ad_r, rt_r, v_r)),
                ("_left", self.actor_left, self.critic_left, (o_l, a_l, lp_l, ad_l, rt_l, v_l)),
            ):
                a_obj, c_obj = ppo_pair(actor, critic, *args)
                for kind, obj, tx in ((f"actor{name}", a_obj, self.actor_tx),
                                      (f"critic{name}", c_obj, self.critic_tx)):
                    loss, grads = jax.value_and_grad(obj)(params[kind])
                    upd, opts[kind] = tx.update(grads, opts[kind], params[kind])
                    params[kind] = optax.apply_updates(params[kind], upd)
                    losses[kind] = loss

            # team actor: PPO + scheduled KL(ind ‖ team) (eqsd2.py:425-432)
            ad_tn = ma_base.normalize_advantages(ad_t)

            def team_actor_obj(p):
                lpn, ent = self.actor_team.apply(
                    p, o_t, a_t, method=type(self.actor_team).logprob_entropy
                )
                ppo = ma_base.ppo_actor_loss(
                    lpn, lp_t, ad_tn, ent, cfg.algo.ratio_clip, cfg.algo.lambda_entropy
                )
                lp_joint, _ = self.actor_team.apply(
                    p, o_is, a_is, method=type(self.actor_team).logprob_entropy
                )
                # logp_indep is detached (eqsd2.py:386): lp_is came from rollout
                kl = jnp.mean(lp_is - lp_joint)
                return ppo + kl_weight * kl

            loss, grads = jax.value_and_grad(team_actor_obj)(params["actor_team"])
            upd, opts["actor_team"] = self.actor_tx.update(
                grads, opts["actor_team"], params["actor_team"]
            )
            params["actor_team"] = optax.apply_updates(params["actor_team"], upd)
            losses["actor_team"] = loss

            def team_critic_obj(p):
                vn = self.critic_team.apply(p, o_t)[..., 0]
                return ma_base.ppo_value_loss(
                    vn, rt_t, v_t, cfg.algo.ratio_clip, cfg.algo.value_clip
                )

            loss, grads = jax.value_and_grad(team_critic_obj)(params["critic_team"])
            upd, opts["critic_team"] = self.critic_tx.update(
                grads, opts["critic_team"], params["critic_team"]
            )
            params["critic_team"] = optax.apply_updates(params["critic_team"], upd)
            losses["critic_team"] = loss

            state = state.replace(
                params=params, opts=opts, update_count=state.update_count + 1
            )
            return state, losses

        def epoch(state, key):
            mb = ma_base.epoch_minibatches(key, data, cfg.algo.batch_size)
            return jax.lax.scan(minibatch_update, state, mb)

        keys = jax.random.split(k_perm, cfg.algo.update_times)
        state, losses = jax.lax.scan(lambda s, k: epoch(s, k), state, keys)
        metrics = {**ma_base.loss_metrics(losses), **state.stats.metrics()}
        return state, metrics

    def eval_actor_apply(self, params, obs_n):
        """Evaluate the TEAM policy (the distillation target)."""
        ob_r, ob_l = self.ma.split_obs(obs_n, None)
        ob_team = jnp.concatenate([ob_r, ob_l], axis=-1)
        mean, _ = self.actor_team.apply(params["actor_team"], ob_team)
        a = self.ma.action_dim
        return self.ma.merge_actions(mean[:, :a], mean[:, a:], None)
