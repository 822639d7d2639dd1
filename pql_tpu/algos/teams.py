"""Split-population team agents (reference pql/algo/iart.py,
ppoteam.py, ppoteam2.py).

All three train two behavioral populations in one vectorized env batch —
envs [0, E/2) driven by the *individual* per-hand policies, envs [E/2, E)
driven by *team* policies — and couple them through extra loss terms:

- **IART** (reference iart.py): the team side is a second PAIR of
  per-hand policies trained on the team reward; each individual actor
  additionally gets an importance-weighted clipped term on the team
  half's data, with the ratio taken against the team policy and the clip
  range scaled by μ = exp(logπ_ind_old − logπ_team_new)
  (iart.py:309-331).
- **IPPOTeam** (reference ppoteam.py): per-hand actors roll ALL envs (the
  team half's joint action comes from a joint team actor on the full
  obs); hand losses mix the individual and TOTAL advantages (critic_tot
  on the combined obs/reward); the team actor gets PPO on its stream plus
  a performance-gated imitation of the independent joint action — only
  where V_ind ≥ V_team (ppoteam.py:401-418).
- **IPPOTeam2** (reference ppoteam2.py): same losses, cleaner data
  pathway — the per-hand and total streams use ONLY the individual half
  of the envs (ppoteam2.py:137-222).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from pql_tpu.algos import base, ma_base
from pql_tpu.algos.ippo import IPPOState
from pql_tpu.envs.base import VecEnv
from pql_tpu.models import get_model
from pql_tpu.models.emlp import concat_reps
from pql_tpu.ops import RunningMeanStd
from pql_tpu.utils.trackers import EpisodeStats


def _gae(cfg, rew, dones, val, trunc, nv, nd):
    return ma_base.gae(
        rew, dones, val, trunc, nv, nd, cfg.algo.gamma, cfg.algo.lambda_gae_adv,
        cfg.algo.use_gae,
    )


def _opt_step(tx, obj, params, opts, key, losses):
    loss, grads = jax.value_and_grad(obj)(params[key])
    upd, opts[key] = tx.update(grads, opts[key], params[key])
    params[key] = optax.apply_updates(params[key], upd)
    losses[key] = loss


class _SplitPopBase:
    """Shared boilerplate for the split-population agents."""

    def __init__(self, cfg, env: VecEnv):
        if env.num_envs % 2:
            raise ValueError(f"{self.name} needs an even num_envs")
        self.cfg = cfg
        self.env = env
        self.ma = ma_base.MultiAgentCtx(env)
        self.half = env.num_envs // 2
        self.dtype = base.compute_dtype(cfg)
        self.actor_tx = base.build_optimizer(cfg.algo.actor_lr, cfg.algo.max_grad_norm)
        self.critic_tx = base.build_optimizer(cfg.algo.critic_lr, cfg.algo.max_grad_norm)
        self._build_nets()
        self.train_iter = jax.jit(self._train_iter)

    def _norm(self, obs_rms, obs):
        return obs_rms.normalize(obs) if self.cfg.algo.obs_norm else obs

    def _make_state(self, params, opts, rng):
        cfg, env = self.cfg, self.env
        k_env, k_loop = jax.random.split(rng)
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

    def _init_opts(self, params):
        return {
            name: (self.actor_tx if name.startswith("actor") else self.critic_tx).init(p)
            for name, p in params.items()
        }

    def _epoch_scan(self, state, data, k_perm, minibatch_update):
        cfg = self.cfg

        def epoch(state, key):
            mb = ma_base.epoch_minibatches(key, data, cfg.algo.batch_size)
            return jax.lax.scan(minibatch_update, state, mb)

        keys = jax.random.split(k_perm, cfg.algo.update_times)
        state, losses = jax.lax.scan(lambda s, k: epoch(s, k), state, keys)
        return state, {**ma_base.loss_metrics(losses), **state.stats.metrics()}


class IART(_SplitPopBase):
    name = "IART"

    def _build_nets(self):
        cfg = self.cfg
        self.actor = self.ma.make_actor(cfg, self.dtype, side=0)
        self.actor_left = self.ma.make_actor(cfg, self.dtype, side=1)
        self.critic = self.ma.make_critic(cfg, self.dtype, side=0)
        self.critic_left = self.ma.make_critic(cfg, self.dtype, side=1)
        self.actor_team = self.ma.make_actor(cfg, self.dtype, side=0)
        self.actor_left_team = self.ma.make_actor(cfg, self.dtype, side=1)
        self.critic_team = self.ma.make_critic(cfg, self.dtype, side=0)
        self.critic_left_team = self.ma.make_critic(cfg, self.dtype, side=1)

    def init(self, rng):
        k = jax.random.split(rng, 9)
        d_r, d_l = self.ma.obs_dims
        z_r, z_l = jnp.zeros((1, d_r)), jnp.zeros((1, d_l))
        params = {
            "actor": self.actor.init(k[0], z_r),
            "actor_left": self.actor_left.init(k[1], z_l),
            "critic": self.critic.init(k[2], z_r),
            "critic_left": self.critic_left.init(k[3], z_l),
            "actor_team": self.actor_team.init(k[4], z_r),
            "actor_left_team": self.actor_left_team.init(k[5], z_l),
            "critic_team": self.critic_team.init(k[6], z_r),
            "critic_left_team": self.critic_left_team.init(k[7], z_l),
        }
        return self._make_state(params, self._init_opts(params), k[8])

    def _train_iter(self, state: IPPOState):
        cfg, env, half = self.cfg, self.env, self.half
        rng, k_roll, k_perm = jax.random.split(state.rng, 3)
        state = state.replace(rng=rng)

        def step_fn(carry, _):
            env_state, obs, dones, obs_rms, stats, k = carry
            k, k1, k2, k3, k4, k_e = jax.random.split(k, 6)
            tracker = env.symmetry_tracker(env_state)
            if cfg.algo.obs_norm:
                obs_rms = obs_rms.update(obs)
            obs_n = self._norm(obs_rms, obs)
            ob_r, ob_l = self.ma.split_obs(obs_n, tracker)
            p = state.params

            a_r, lp_r, _ = self.actor.apply(p["actor"], ob_r[:half], k1,
                                            method=type(self.actor).sample)
            a_l, lp_l, _ = self.actor_left.apply(p["actor_left"], ob_l[:half], k2,
                                                 method=type(self.actor_left).sample)
            a_rt, lp_rt, _ = self.actor_team.apply(p["actor_team"], ob_r[half:], k3,
                                                   method=type(self.actor_team).sample)
            a_lt, lp_lt, _ = self.actor_left_team.apply(
                p["actor_left_team"], ob_l[half:], k4,
                method=type(self.actor_left_team).sample,
            )
            # individual actors' logprob of the TEAM actions (iart.py:182-186)
            lp_rt_side, _ = self.actor.apply(p["actor"], ob_r[half:], a_rt,
                                             method=type(self.actor).logprob_entropy)
            lp_lt_side, _ = self.actor_left.apply(
                p["actor_left"], ob_l[half:], a_lt,
                method=type(self.actor_left).logprob_entropy,
            )
            v_r = self.critic.apply(p["critic"], ob_r[:half])[..., 0]
            v_l = self.critic_left.apply(p["critic_left"], ob_l[:half])[..., 0]
            v_rt = self.critic_team.apply(p["critic_team"], ob_r[half:])[..., 0]
            v_lt = self.critic_left_team.apply(p["critic_left_team"], ob_l[half:])[..., 0]
            v_rt_side = self.critic.apply(p["critic"], ob_r[half:])[..., 0]
            v_lt_side = self.critic_left.apply(p["critic_left"], ob_l[half:])[..., 0]

            act_right = jnp.concatenate([a_r, a_rt], axis=0)
            act_left = jnp.concatenate([a_l, a_lt], axis=0)
            action = self.ma.merge_actions(act_right, act_left, tracker)
            env_state, next_obs, reward, done, info = env.step(env_state, action, k_e)
            rew_r, rew_l = self.ma.split_reward(info, tracker)
            stats = stats.update(rew_r + rew_l, done, info)
            # team halves optimize the shared (combined) reward — the
            # in-repo analog of the bidex team reward channels
            # (iart.py:188: four channels from the external manager)
            rew_team = cfg.algo.reward_scale * (rew_r + rew_l)[half:]
            rs = cfg.algo.reward_scale
            out = dict(
                obs_r=ob_r[:half], obs_l=ob_l[:half],
                obs_rt=ob_r[half:], obs_lt=ob_l[half:],
                dones_ind=dones[:half], dones_team=dones[half:],
                a_r=a_r, a_l=a_l, a_rt=a_rt, a_lt=a_lt,
                lp_r=lp_r, lp_l=lp_l, lp_rt=lp_rt, lp_lt=lp_lt,
                lp_rt_side=lp_rt_side, lp_lt_side=lp_lt_side,
                rew_r=rs * rew_r[:half], rew_l=rs * rew_l[:half],
                rew_rt_side=rs * rew_r[half:], rew_lt_side=rs * rew_l[half:],
                rew_team=rew_team,
                v_r=v_r, v_l=v_l, v_rt=v_rt, v_lt=v_lt,
                v_rt_side=v_rt_side, v_lt_side=v_lt_side,
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

        # bootstrap values
        obs_n = self._norm(state.obs_rms, state.obs)
        tracker = env.symmetry_tracker(state.env_state)
        ob_r, ob_l = self.ma.split_obs(obs_n, tracker)
        p = state.params
        nd_i, nd_t = state.dones[:half], state.dones[half:]
        streams = {}
        for key, critic, pk, o, rew, don, val, trc, nd in (
            ("r", self.critic, "critic", ob_r[:half], traj["rew_r"], traj["dones_ind"],
             traj["v_r"], traj["trunc_ind"], nd_i),
            ("l", self.critic_left, "critic_left", ob_l[:half], traj["rew_l"],
             traj["dones_ind"], traj["v_l"], traj["trunc_ind"], nd_i),
            ("rt", self.critic_team, "critic_team", ob_r[half:], traj["rew_team"],
             traj["dones_team"], traj["v_rt"], traj["trunc_team"], nd_t),
            ("lt", self.critic_left_team, "critic_left_team", ob_l[half:],
             traj["rew_team"], traj["dones_team"], traj["v_lt"], traj["trunc_team"], nd_t),
            ("rt_side", self.critic, "critic", ob_r[half:], traj["rew_rt_side"],
             traj["dones_team"], traj["v_rt_side"], traj["trunc_team"], nd_t),
            ("lt_side", self.critic_left, "critic_left", ob_l[half:],
             traj["rew_lt_side"], traj["dones_team"], traj["v_lt_side"],
             traj["trunc_team"], nd_t),
        ):
            nv = critic.apply(p[pk], o)[..., 0]
            adv, ret = _gae(cfg, rew, don, val, trc, nv, nd)
            streams[key] = (adv, ret)

        f = ma_base.flat
        data = (
            f(traj["obs_r"]), f(traj["a_r"]), f(traj["lp_r"]),
            f(streams["r"][0]), f(streams["r"][1]), f(traj["v_r"]),
            f(traj["obs_l"]), f(traj["a_l"]), f(traj["lp_l"]),
            f(streams["l"][0]), f(streams["l"][1]), f(traj["v_l"]),
            f(traj["obs_rt"]), f(traj["a_rt"]), f(traj["lp_rt"]),
            f(streams["rt"][0]), f(streams["rt"][1]), f(traj["v_rt"]),
            f(traj["obs_lt"]), f(traj["a_lt"]), f(traj["lp_lt"]),
            f(streams["lt"][0]), f(streams["lt"][1]), f(traj["v_lt"]),
            f(traj["lp_rt_side"]), f(streams["rt_side"][0]),
            f(traj["lp_lt_side"]), f(streams["lt_side"][0]),
        )

        def iw_actor_obj(actor, actor2, p2, o, a, lp, adv, o2, a2, lp2_side, adv2):
            """Own clipped surrogate + importance-weighted team-side term
            (iart.py:309-331)."""

            def obj(pp):
                lpn, ent = actor.apply(pp, o, a, method=type(actor).logprob_entropy)
                own = ma_base.ppo_actor_loss(
                    lpn, lp, ma_base.normalize_advantages(adv), ent,
                    cfg.algo.ratio_clip, cfg.algo.lambda_entropy,
                )
                lpn_off, _ = actor.apply(pp, o2, a2, method=type(actor).logprob_entropy)
                lpn_team, _ = actor2.apply(p2, o2, a2, method=type(actor2).logprob_entropy)
                lpn_team = jax.lax.stop_gradient(lpn_team)
                ratio_off = jnp.exp(lpn_off - lpn_team)
                miu = jnp.exp(lp2_side - lpn_team)
                adv2n = ma_base.normalize_advantages(adv2)
                l1 = -adv2n * ratio_off
                l2 = -adv2n * jnp.clip(
                    ratio_off, miu * (1 - cfg.algo.ratio_clip), miu * (1 + cfg.algo.ratio_clip)
                )
                return own + jnp.mean(jnp.maximum(l1, l2))

            return obj

        def minibatch_update(state, batch):
            (o_r, a_r, lp_r, ad_r, rt_r, v_r,
             o_l, a_l, lp_l, ad_l, rt_l, v_l,
             o_rt, a_rt, lp_rt, ad_rt, rt_rt, v_rt,
             o_lt, a_lt, lp_lt, ad_lt, rt_lt, v_lt,
             lp_rts, ad_rts, lp_lts, ad_lts) = batch
            params, opts = dict(state.params), dict(state.opts)
            losses = {}

            _opt_step(self.actor_tx, iw_actor_obj(
                self.actor, self.actor_team, params["actor_team"],
                o_r, a_r, lp_r, ad_r, o_rt, a_rt, lp_rts, ad_rts,
            ), params, opts, "actor", losses)
            _opt_step(self.actor_tx, iw_actor_obj(
                self.actor_left, self.actor_left_team, params["actor_left_team"],
                o_l, a_l, lp_l, ad_l, o_lt, a_lt, lp_lts, ad_lts,
            ), params, opts, "actor_left", losses)

            def plain_actor(actor, o, a, lp, adv):
                def obj(pp):
                    lpn, ent = actor.apply(pp, o, a, method=type(actor).logprob_entropy)
                    return ma_base.ppo_actor_loss(
                        lpn, lp, ma_base.normalize_advantages(adv), ent,
                        cfg.algo.ratio_clip, cfg.algo.lambda_entropy,
                    )
                return obj

            _opt_step(self.actor_tx, plain_actor(self.actor_team, o_rt, a_rt, lp_rt, ad_rt),
                      params, opts, "actor_team", losses)
            _opt_step(self.actor_tx,
                      plain_actor(self.actor_left_team, o_lt, a_lt, lp_lt, ad_lt),
                      params, opts, "actor_left_team", losses)

            def critic_obj(critic, o, ret, v):
                def obj(pp):
                    vn = critic.apply(pp, o)[..., 0]
                    return ma_base.ppo_value_loss(
                        vn, ret, v, cfg.algo.ratio_clip, cfg.algo.value_clip
                    )
                return obj

            _opt_step(self.critic_tx, critic_obj(self.critic, o_r, rt_r, v_r),
                      params, opts, "critic", losses)
            _opt_step(self.critic_tx, critic_obj(self.critic_left, o_l, rt_l, v_l),
                      params, opts, "critic_left", losses)
            _opt_step(self.critic_tx, critic_obj(self.critic_team, o_rt, rt_rt, v_rt),
                      params, opts, "critic_team", losses)
            _opt_step(self.critic_tx,
                      critic_obj(self.critic_left_team, o_lt, rt_lt, v_lt),
                      params, opts, "critic_left_team", losses)

            state = state.replace(params=params, opts=opts,
                                  update_count=state.update_count + 1)
            return state, losses

        return self._epoch_scan(state, data, k_perm, minibatch_update)

    def eval_actor_apply(self, params, obs_n):
        ob_r, ob_l = self.ma.split_obs(obs_n, None)
        mean_r, _ = self.actor.apply(params["actor"], ob_r)
        mean_l, _ = self.actor_left.apply(params["actor_left"], ob_l)
        return self.ma.merge_actions(mean_r, mean_l, None)


class IPPOTeam(_SplitPopBase):
    name = "IPPOTeam"
    ind_streams_full = True  # Team: hand/tot streams over ALL envs; Team2: first half

    def _build_nets(self):
        cfg = self.cfg
        self.actor = self.ma.make_actor(cfg, self.dtype, side=0)
        self.actor_left = self.ma.make_actor(cfg, self.dtype, side=1)
        self.critic = self.ma.make_critic(cfg, self.dtype, side=0)
        self.critic_left = self.ma.make_critic(cfg, self.dtype, side=1)
        joint_act = 2 * self.ma.action_dim
        if "Equivariant" in cfg.algo.act_class and self.ma.eq is not None:
            self.actor_team = get_model("DiagGaussianEquivariantMLPPolicy")(
                gen_in=self.ma.joint_obs_gen(),
                gen_out=concat_reps(self.ma.act_gen(), self.ma.act_gen()),
                dtype=self.dtype,
            )
        else:
            self.actor_team = get_model("DiagGaussianMLPPolicy")(
                act_dim=joint_act, dtype=self.dtype
            )
        self.critic_tot = self.ma.make_critic(cfg, self.dtype, central=True)
        self.critic_team = self.ma.make_critic(cfg, self.dtype, central=True)

    def init(self, rng):
        k = jax.random.split(rng, 8)
        d_r, d_l = self.ma.obs_dims
        joint = self.env.obs_dim
        params = {
            "actor": self.actor.init(k[0], jnp.zeros((1, d_r))),
            "actor_left": self.actor_left.init(k[1], jnp.zeros((1, d_l))),
            "critic": self.critic.init(k[2], jnp.zeros((1, d_r))),
            "critic_left": self.critic_left.init(k[3], jnp.zeros((1, d_l))),
            "actor_team": self.actor_team.init(k[4], jnp.zeros((1, joint))),
            "critic_tot": self.critic_tot.init(k[5], jnp.zeros((1, joint))),
            "critic_team": self.critic_team.init(k[6], jnp.zeros((1, joint))),
        }
        return self._make_state(params, self._init_opts(params), k[7])

    def _train_iter(self, state: IPPOState):
        cfg, env, half = self.cfg, self.env, self.half
        rng, k_roll, k_perm = jax.random.split(state.rng, 3)
        state = state.replace(rng=rng)
        full = self.ind_streams_full
        sl = slice(None) if full else slice(0, half)  # ind-stream env slice

        def step_fn(carry, _):
            env_state, obs, dones, obs_rms, stats, k = carry
            k, k1, k2, k3, k_e = jax.random.split(k, 5)
            tracker = env.symmetry_tracker(env_state)
            if cfg.algo.obs_norm:
                obs_rms = obs_rms.update(obs)
            obs_n = self._norm(obs_rms, obs)
            ob_r, ob_l = self.ma.split_obs(obs_n, tracker)
            p = state.params

            a_r, lp_r, _ = self.actor.apply(p["actor"], ob_r[sl], k1,
                                            method=type(self.actor).sample)
            a_l, lp_l, _ = self.actor_left.apply(p["actor_left"], ob_l[sl], k2,
                                                 method=type(self.actor_left).sample)
            a_team, lp_team, _ = self.actor_team.apply(
                p["actor_team"], obs_n[half:], k3, method=type(self.actor_team).sample
            )
            v_r = self.critic.apply(p["critic"], ob_r[sl])[..., 0]
            v_l = self.critic_left.apply(p["critic_left"], ob_l[sl])[..., 0]
            v_tot = self.critic_tot.apply(p["critic_tot"], obs_n[sl])[..., 0]
            v_team = self.critic_team.apply(p["critic_team"], obs_n[half:])[..., 0]

            a = self.ma.action_dim
            act_ind = self.ma.merge_actions(a_r, a_l, None)  # [sl envs, 2a]
            exec_team = jnp.concatenate([a_team[:, :a], a_team[:, a:]], axis=-1)
            action = jnp.concatenate([act_ind[:half], exec_team], axis=0)
            env_state, next_obs, reward, done, info = env.step(env_state, action, k_e)
            rew_r, rew_l = self.ma.split_reward(info, tracker)
            stats = stats.update(rew_r + rew_l, done, info)
            rs = cfg.algo.reward_scale
            rew_tot = rs * (rew_r + rew_l)
            out = dict(
                obs_r=ob_r[sl], obs_l=ob_l[sl], obs_tot=obs_n[sl],
                obs_team=obs_n[half:],
                dones_ind=dones[sl], dones_team=dones[half:],
                a_r=a_r, a_l=a_l, act_ind=act_ind, a_team=a_team,
                lp_r=lp_r, lp_l=lp_l, lp_team=lp_team,
                rew_r=rs * rew_r[sl], rew_l=rs * rew_l[sl],
                rew_tot=rew_tot[sl], rew_team=rew_tot[half:],
                v_r=v_r, v_l=v_l, v_tot=v_tot, v_team=v_team,
                trunc_ind=info["truncated"][sl].astype(jnp.float32),
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

        obs_n = self._norm(state.obs_rms, state.obs)
        tracker = env.symmetry_tracker(state.env_state)
        ob_r, ob_l = self.ma.split_obs(obs_n, tracker)
        p = state.params
        nd_i, nd_t = state.dones[sl], state.dones[half:]

        def stream(critic, pk, o_last, rew, dones_s, val, trunc, nd):
            nv = critic.apply(p[pk], o_last)[..., 0]
            return _gae(cfg, rew, dones_s, val, trunc, nv, nd)

        adv_r, ret_r = stream(self.critic, "critic", ob_r[sl], traj["rew_r"],
                              traj["dones_ind"], traj["v_r"], traj["trunc_ind"], nd_i)
        adv_l, ret_l = stream(self.critic_left, "critic_left", ob_l[sl], traj["rew_l"],
                              traj["dones_ind"], traj["v_l"], traj["trunc_ind"], nd_i)
        adv_tot, ret_tot = stream(self.critic_tot, "critic_tot", obs_n[sl],
                                  traj["rew_tot"], traj["dones_ind"], traj["v_tot"],
                                  traj["trunc_ind"], nd_i)
        adv_team, ret_team = stream(self.critic_team, "critic_team", obs_n[half:],
                                    traj["rew_team"], traj["dones_team"], traj["v_team"],
                                    traj["trunc_team"], nd_t)

        # reference ppoteam computes GAE over ALL envs then trains the
        # hand/tot nets on the first (individual) half only
        # (compute_adv split=True, update uses data[0..2]; ppoteam.py:221-233)
        fh = (lambda x: x[:, :half]) if full else (lambda x: x)
        f = lambda x: ma_base.flat(fh(x))
        ft = ma_base.flat  # team stream is already second-half only
        data = (
            f(traj["obs_r"]), f(traj["a_r"]), f(traj["lp_r"]), f(adv_r), f(ret_r), f(traj["v_r"]),
            f(traj["obs_l"]), f(traj["a_l"]), f(traj["lp_l"]), f(adv_l), f(ret_l), f(traj["v_l"]),
            f(traj["obs_tot"]), f(traj["act_ind"]), f(adv_tot), f(ret_tot), f(traj["v_tot"]),
            ft(traj["obs_team"]), ft(traj["a_team"]), ft(traj["lp_team"]), ft(adv_team),
            ft(ret_team), ft(traj["v_team"]),
        )

        def minibatch_update(state, batch):
            (o_r, a_r, lp_r, ad_r, rt_r, v_r,
             o_l, a_l, lp_l, ad_l, rt_l, v_l,
             o_tot, a_tot, ad_tot, rt_tot, v_tot,
             o_team, a_team, lp_team, ad_team, rt_team, v_team) = batch
            params, opts = dict(state.params), dict(state.opts)
            losses = {}
            ad_totn = ma_base.normalize_advantages(ad_tot)

            def hand_obj(actor, o, a, lp, adv):
                """Own clipped term + total-advantage clipped term
                (ppoteam.py:387-398)."""
                advn = ma_base.normalize_advantages(adv)

                def obj(pp):
                    lpn, ent = actor.apply(pp, o, a, method=type(actor).logprob_entropy)
                    own = ma_base.ppo_actor_loss(
                        lpn, lp, advn, ent, cfg.algo.ratio_clip, cfg.algo.lambda_entropy
                    )
                    tot = ma_base.ppo_actor_loss(
                        lpn, lp, ad_totn, jnp.zeros_like(ent), cfg.algo.ratio_clip, 0.0
                    )
                    return own + tot
                return obj

            _opt_step(self.actor_tx, hand_obj(self.actor, o_r, a_r, lp_r, ad_r),
                      params, opts, "actor", losses)
            _opt_step(self.actor_tx, hand_obj(self.actor_left, o_l, a_l, lp_l, ad_l),
                      params, opts, "actor_left", losses)

            # team actor: PPO + performance-gated imitation (ppoteam.py:401-418)
            v_ind = self.critic_tot.apply(params["critic_tot"], o_tot)[..., 0]
            v_tm = self.critic_team.apply(params["critic_team"], o_team)[..., 0]
            mask = jax.lax.stop_gradient((v_ind - v_tm >= 0.0).astype(jnp.float32))

            def team_obj(pp):
                lpn, ent = self.actor_team.apply(
                    pp, o_team, a_team, method=type(self.actor_team).logprob_entropy
                )
                ppo = ma_base.ppo_actor_loss(
                    lpn, lp_team, ma_base.normalize_advantages(ad_team), ent,
                    cfg.algo.ratio_clip, cfg.algo.lambda_entropy,
                )
                lp_ind, _ = self.actor_team.apply(
                    pp, o_tot, a_tot, method=type(self.actor_team).logprob_entropy
                )
                imitation = -jnp.mean(lp_ind * mask)
                return ppo + imitation

            _opt_step(self.actor_tx, team_obj, params, opts, "actor_team", losses)

            def critic_obj(critic, o, ret, v):
                def obj(pp):
                    vn = critic.apply(pp, o)[..., 0]
                    return ma_base.ppo_value_loss(
                        vn, ret, v, cfg.algo.ratio_clip, cfg.algo.value_clip
                    )
                return obj

            _opt_step(self.critic_tx, critic_obj(self.critic, o_r, rt_r, v_r),
                      params, opts, "critic", losses)
            _opt_step(self.critic_tx, critic_obj(self.critic_left, o_l, rt_l, v_l),
                      params, opts, "critic_left", losses)
            _opt_step(self.critic_tx, critic_obj(self.critic_tot, o_tot, rt_tot, v_tot),
                      params, opts, "critic_tot", losses)
            _opt_step(self.critic_tx, critic_obj(self.critic_team, o_team, rt_team, v_team),
                      params, opts, "critic_team", losses)

            state = state.replace(params=params, opts=opts,
                                  update_count=state.update_count + 1)
            return state, losses

        return self._epoch_scan(state, data, k_perm, minibatch_update)

    def eval_actor_apply(self, params, obs_n):
        """Evaluate the team (joint) policy."""
        mean, _ = self.actor_team.apply(params["actor_team"], obs_n)
        a = self.ma.action_dim
        return self.ma.merge_actions(mean[:, :a], mean[:, a:], None)


class IPPOTeam2(IPPOTeam):
    name = "IPPOTeam2"
    ind_streams_full = False
