"""Visual PPO agents (reference pql/algo/ppoV.py, ippoV.py).

- **PPOV**: single-agent visual PPO — the actor consumes (camera images,
  proprio, pointcloud) through DiagGaussianMLPVPolicy, the critic sees
  the PRIVILEGED flat state (reference ppoV.py:20-44: actor on dict obs,
  critic on obs['critic']); the actor update recomputes features through
  the encoder (ppoV.py:170-224). The reference stages images on CPU
  uint8 (ppoV.py:54-56); here rollout, rendering and update are one
  jitted program, so the trajectories stay in HBM.
- **IPPOV**: two-agent visual IPPO — per-hand actors on (per-hand
  proprio, shared pointcloud), per-hand privileged-state critics
  (reference ippoV.py:24-61), rewards split via the SymmetryManager.
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
from pql_tpu.models.visual import DiagGaussianMLPVPolicy
from pql_tpu.ops import RunningMeanStd
from pql_tpu.utils.trackers import EpisodeStats


@struct.dataclass
class PPOVState:
    actor_params: Any
    actor_opt: Any
    critic_params: Any
    critic_opt: Any
    obs_rms: RunningMeanStd  # privileged obs
    env_state: Any
    obs: jax.Array
    dones: jax.Array
    stats: EpisodeStats
    rng: jax.Array
    env_steps: jax.Array
    update_count: jax.Array


def _require_visual(env: VecEnv, name: str):
    for attr in ("proprio", "pointcloud"):
        if not hasattr(env.task, attr):
            raise ValueError(
                f"{name} needs a vision task exposing proprio/pointcloud "
                f"(e.g. task=ReacherVision); got {type(env.task).__name__}"
            )


class PPOV:
    name = "PPOV"

    def __init__(self, cfg, env: VecEnv):
        _require_visual(env, self.name)
        self.cfg = cfg
        self.env = env
        self.has_camera = hasattr(env.task, "render")
        dtype = base.compute_dtype(cfg)
        self.actor = DiagGaussianMLPVPolicy(
            act_dim=env.action_dim,
            num_cams=getattr(env.task, "num_cams", 1),
            encoder_type="resnet" if self.has_camera else None,
            feature_dim=256,
            hidden_dim=256,
            dtype=dtype,
        )
        self.critic = get_model(cfg.algo.cri_class)(dtype=dtype)
        self.actor_tx = base.build_optimizer(cfg.algo.actor_lr, cfg.algo.max_grad_norm)
        self.critic_tx = base.build_optimizer(cfg.algo.critic_lr, cfg.algo.max_grad_norm)
        self.train_iter = jax.jit(self._train_iter)

    # -------------------------------------------------------------- helpers

    def _visual_obs(self, env_state):
        """Render policy-side observations from the physics state."""
        task = self.env.task
        proprio = jax.vmap(task.proprio)(env_state.state)
        pc = jax.vmap(task.pointcloud)(env_state.state)
        img = jax.vmap(task.render)(env_state.state) if self.has_camera else None
        return img, proprio, pc

    def _norm(self, obs_rms, obs):
        return obs_rms.normalize(obs) if self.cfg.algo.obs_norm else obs

    def init(self, rng) -> PPOVState:
        cfg, env = self.cfg, self.env
        k_a, k_c, k_env, k_loop = jax.random.split(rng, 4)
        env_state, obs = env.reset(k_env)
        img, proprio, pc = self._visual_obs(env_state)
        actor_params = self.actor.init(k_a, img, proprio, pc)
        if cfg.algo.encoder_weights:
            # local pretrained-encoder hook (the air-gap analog of the
            # reference's ImageNet/DINOv2 downloads, visual.py:183-210)
            from pql_tpu.models.pretrained import merge_pretrained

            actor_params, report = merge_pretrained(actor_params, cfg.algo.encoder_weights)
            if not report["loaded"]:
                raise ValueError(
                    f"encoder_weights={cfg.algo.encoder_weights} matched no params: {report}"
                )
        critic_params = self.critic.init(k_c, jnp.zeros((1, env.obs_dim)))
        return PPOVState(
            actor_params=actor_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic_params=critic_params,
            critic_opt=self.critic_tx.init(critic_params),
            obs_rms=RunningMeanStd.create((env.obs_dim,)),
            env_state=env_state,
            obs=obs,
            dones=jnp.zeros(env.num_envs, jnp.float32),
            stats=base.make_stats(cfg, env),
            rng=k_loop,
            env_steps=jnp.zeros((), jnp.int32),
            update_count=jnp.zeros((), jnp.int32),
        )

    # --------------------------------------------------------------- train

    def _train_iter(self, state: PPOVState):
        cfg, env = self.cfg, self.env
        rng, k_roll, k_perm = jax.random.split(state.rng, 3)
        state = state.replace(rng=rng)

        def step_fn(carry, _):
            env_state, obs, dones, obs_rms, stats, k = carry
            k, k_a, k_e = jax.random.split(k, 3)
            if cfg.algo.obs_norm:
                obs_rms = obs_rms.update(obs)
            obs_n = self._norm(obs_rms, obs)
            img, proprio, pc = self._visual_obs(env_state)
            action, logp, _ = self.actor.apply(
                state.actor_params, img, proprio, pc, k_a,
                method=DiagGaussianMLPVPolicy.sample,
            )
            value = self.critic.apply(state.critic_params, obs_n)[..., 0]
            env_state, next_obs, reward, done, info = env.step(env_state, action, k_e)
            stats = stats.update(reward, done, info)
            out = dict(
                obs=obs, proprio=proprio, pc=pc, dones=dones,
                action=action, logp=logp,
                reward=cfg.algo.reward_scale * reward, value=value,
                truncated=info["truncated"].astype(jnp.float32),
            )
            if self.has_camera:
                out["img"] = img
            return (env_state, next_obs, done, obs_rms, stats, k), out

        carry = (state.env_state, state.obs, state.dones, state.obs_rms, state.stats, k_roll)
        carry, traj = jax.lax.scan(step_fn, carry, None, length=cfg.algo.horizon_len)
        env_state, obs, dones, obs_rms, stats, _ = carry
        state = state.replace(
            env_state=env_state, obs=obs, dones=dones, obs_rms=obs_rms, stats=stats,
            env_steps=state.env_steps + cfg.algo.horizon_len * env.num_envs,
        )

        obs_n = self._norm(state.obs_rms, state.obs)
        next_value = self.critic.apply(state.critic_params, obs_n)[..., 0]
        adv, ret = ma_base.gae(
            traj["reward"], traj["dones"], traj["value"], traj["truncated"],
            next_value, state.dones, cfg.algo.gamma, cfg.algo.lambda_gae_adv,
            cfg.algo.use_gae,
        )
        f = ma_base.flat
        data = [
            f(traj["obs"]), f(traj["proprio"]), f(traj["pc"]),
            f(traj["action"]), f(traj["logp"]), f(adv), f(ret), f(traj["value"]),
        ]
        if self.has_camera:
            data.append(f(traj["img"]))
        data = tuple(data)

        def minibatch_update(state, batch):
            if self.has_camera:
                obs, proprio, pc, actions, logp_old, adv, returns, v_old, img = batch
            else:
                obs, proprio, pc, actions, logp_old, adv, returns, v_old = batch
                img = None
            obs_n = self._norm(state.obs_rms, obs)
            adv = ma_base.normalize_advantages(adv)

            def actor_obj(p):
                logp_new, entropy = self.actor.apply(
                    p, img, proprio, pc, actions,
                    method=DiagGaussianMLPVPolicy.logprob_entropy,
                )
                return ma_base.ppo_actor_loss(
                    logp_new, logp_old, adv, entropy, cfg.algo.ratio_clip,
                    cfg.algo.lambda_entropy,
                )

            def critic_obj(p):
                v_new = self.critic.apply(p, obs_n)[..., 0]
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
            return state, {"actor": a_loss, "critic": c_loss}

        def epoch(state, key):
            mb = ma_base.epoch_minibatches(key, data, cfg.algo.batch_size)
            return jax.lax.scan(minibatch_update, state, mb)

        keys = jax.random.split(k_perm, cfg.algo.update_times)
        state, losses = jax.lax.scan(lambda s, k: epoch(s, k), state, keys)
        return state, {**ma_base.loss_metrics(losses), **state.stats.metrics()}

    @property
    def eval_actor_apply(self):
        def apply(params, obs_n, env_state):
            img, proprio, pc = self._visual_obs(env_state)
            mean, _ = self.actor.apply(params, img, proprio, pc)
            return mean

        apply.needs_env_state = True
        return apply


class IPPOV:
    """Two-agent visual IPPO (reference ippoV.py)."""

    name = "IPPOV"

    def __init__(self, cfg, env: VecEnv):
        _require_visual(env, self.name)
        self.cfg = cfg
        self.env = env
        self.ma = ma_base.MultiAgentCtx(env)
        dtype = base.compute_dtype(cfg)
        # per-hand actors: proprio + shared pointcloud, no camera
        # (reference ippoV.py:30-31,54-61)
        self.actor = DiagGaussianMLPVPolicy(
            act_dim=self.ma.action_dim, encoder_type=None,
            feature_dim=256, hidden_dim=256, dtype=dtype,
        )
        self.actor_left = DiagGaussianMLPVPolicy(
            act_dim=self.ma.action_dim, encoder_type=None,
            feature_dim=256, hidden_dim=256, dtype=dtype,
        )
        self.critic = self.ma.make_critic(cfg, dtype, side=0)
        self.critic_left = self.ma.make_critic(cfg, dtype, side=1)
        self.actor_tx = base.build_optimizer(cfg.algo.actor_lr, cfg.algo.max_grad_norm)
        self.critic_tx = base.build_optimizer(cfg.algo.critic_lr, cfg.algo.max_grad_norm)
        self.train_iter = jax.jit(self._train_iter)

    def _norm(self, obs_rms, obs):
        return obs_rms.normalize(obs) if self.cfg.algo.obs_norm else obs

    def _visual(self, env_state):
        task = self.env.task
        proprio = jax.vmap(task.proprio)(env_state.state)  # [E, 2, d]
        pc = jax.vmap(task.pointcloud)(env_state.state)  # [E, N, 3]
        return proprio, pc

    def init(self, rng):
        from pql_tpu.algos.ippo import IPPOState

        cfg, env = self.cfg, self.env
        k = jax.random.split(rng, 6)
        env_state, obs = env.reset(k[4])
        proprio, pc = self._visual(env_state)
        params = {
            "actor": self.actor.init(k[0], None, proprio[:, 0], pc),
            "actor_left": self.actor_left.init(k[1], None, proprio[:, 1], pc),
            "critic": self.critic.init(k[2], jnp.zeros((1, self.ma.obs_dims[0]))),
            "critic_left": self.critic_left.init(
                k[3], jnp.zeros((1, self.ma.obs_dims[1]))
            ),
        }
        opts = {
            name: (self.actor_tx if name.startswith("actor") else self.critic_tx).init(p)
            for name, p in params.items()
        }
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
            rng=k[5],
            env_steps=jnp.zeros((), jnp.int32),
            update_count=jnp.zeros((), jnp.int32),
        )

    def _train_iter(self, state):
        cfg, env = self.cfg, self.env
        rng, k_roll, k_perm = jax.random.split(state.rng, 3)
        state = state.replace(rng=rng)

        def step_fn(carry, _):
            env_state, obs, dones, obs_rms, stats, k = carry
            k, k_r, k_l, k_e = jax.random.split(k, 4)
            tracker = env.symmetry_tracker(env_state)
            if cfg.algo.obs_norm:
                obs_rms = obs_rms.update(obs)
            obs_n = self._norm(obs_rms, obs)
            ob_r, ob_l = self.ma.split_obs(obs_n, tracker)  # privileged views
            proprio, pc = self._visual(env_state)

            act_r, lp_r, _ = self.actor.apply(
                state.params["actor"], None, proprio[:, 0], pc, k_r,
                method=DiagGaussianMLPVPolicy.sample,
            )
            act_l, lp_l, _ = self.actor_left.apply(
                state.params["actor_left"], None, proprio[:, 1], pc, k_l,
                method=DiagGaussianMLPVPolicy.sample,
            )
            v_r = self.critic.apply(state.params["critic"], ob_r)[..., 0]
            v_l = self.critic_left.apply(state.params["critic_left"], ob_l)[..., 0]
            action = self.ma.merge_actions(act_r, act_l, tracker)
            env_state, next_obs, reward, done, info = env.step(env_state, action, k_e)
            rew_r, rew_l = self.ma.split_reward(info, tracker)
            stats = stats.update(rew_r + rew_l, done, info)
            out = dict(
                obs_r=ob_r, obs_l=ob_l, proprio=proprio, pc=pc, dones=dones,
                act_r=act_r, act_l=act_l, lp_r=lp_r, lp_l=lp_l,
                rew_r=cfg.algo.reward_scale * rew_r,
                rew_l=cfg.algo.reward_scale * rew_l,
                v_r=v_r, v_l=v_l,
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
        nv_r = self.critic.apply(state.params["critic"], ob_r)[..., 0]
        nv_l = self.critic_left.apply(state.params["critic_left"], ob_l)[..., 0]
        g = lambda rew, val, nv: ma_base.gae(
            rew, traj["dones"], val, traj["truncated"], nv, state.dones,
            cfg.algo.gamma, cfg.algo.lambda_gae_adv, cfg.algo.use_gae,
        )
        adv_r, ret_r = g(traj["rew_r"], traj["v_r"], nv_r)
        adv_l, ret_l = g(traj["rew_l"], traj["v_l"], nv_l)

        f = ma_base.flat
        data = (
            f(traj["obs_r"]), f(traj["proprio"][:, :, 0]), f(traj["pc"]),
            f(traj["act_r"]), f(traj["lp_r"]), f(adv_r), f(ret_r), f(traj["v_r"]),
            f(traj["obs_l"]), f(traj["proprio"][:, :, 1]),
            f(traj["act_l"]), f(traj["lp_l"]), f(adv_l), f(ret_l), f(traj["v_l"]),
        )

        def minibatch_update(state, batch):
            (o_r, pr_r, pc, a_r, lp_r, ad_r, rt_r, v_r,
             o_l, pr_l, a_l, lp_l, ad_l, rt_l, v_l) = batch
            params, opts = dict(state.params), dict(state.opts)
            losses = {}

            def actor_obj(actor, pr, a, lp, adv):
                advn = ma_base.normalize_advantages(adv)

                def obj(p):
                    lpn, ent = actor.apply(
                        p, None, pr, pc, a,
                        method=DiagGaussianMLPVPolicy.logprob_entropy,
                    )
                    return ma_base.ppo_actor_loss(
                        lpn, lp, advn, ent, cfg.algo.ratio_clip, cfg.algo.lambda_entropy
                    )
                return obj

            def critic_obj(critic, o, ret, v):
                def obj(p):
                    vn = critic.apply(p, o)[..., 0]
                    return ma_base.ppo_value_loss(
                        vn, ret, v, cfg.algo.ratio_clip, cfg.algo.value_clip
                    )
                return obj

            for kind, obj, tx in (
                ("actor", actor_obj(self.actor, pr_r, a_r, lp_r, ad_r), self.actor_tx),
                ("actor_left", actor_obj(self.actor_left, pr_l, a_l, lp_l, ad_l), self.actor_tx),
                ("critic", critic_obj(self.critic, o_r, rt_r, v_r), self.critic_tx),
                ("critic_left", critic_obj(self.critic_left, o_l, rt_l, v_l), self.critic_tx),
            ):
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

    @property
    def eval_actor_apply(self):
        def apply(params, obs_n, env_state):
            proprio, pc = self._visual(env_state)
            mean_r, _ = self.actor.apply(params["actor"], None, proprio[:, 0], pc)
            mean_l, _ = self.actor_left.apply(
                params["actor_left"], None, proprio[:, 1], pc
            )
            return self.ma.merge_actions(mean_r, mean_l, None)

        apply.needs_env_state = True
        return apply
