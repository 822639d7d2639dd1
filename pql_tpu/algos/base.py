"""Shared actor-critic machinery for all algorithms.

Functional analog of the reference ``ActorCriticBase`` (reference
pql/algo/ac_base.py:15-130): network construction from the string registry,
AdamW optimizers with global-norm gradient clipping, exploration rollouts,
and episode tracking — all expressed as pure functions over pytree states
so each algorithm's whole iteration compiles into one XLA program.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pql_tpu.envs.base import VecEnv, handle_timeout
from pql_tpu.models import get_model
from pql_tpu.ops import RunningMeanStd, add_mixed_normal_noise, add_normal_noise
from pql_tpu.ops.schedules import schedule_value
from pql_tpu.utils.trackers import EpisodeStats


def compute_dtype(cfg) -> jnp.dtype:
    return jnp.bfloat16 if cfg.algo.compute_dtype == "bfloat16" else jnp.float32


def probe_info(env: VecEnv) -> dict:
    """Shape-probe the task's per-step info dict (no FLOPs)."""
    task = env.task
    return jax.eval_shape(
        lambda k: task.dynamics(task.init_state(k), jnp.zeros(task.action_dim), k)[3],
        jax.random.PRNGKey(0),
    )


def make_stats(cfg, env: VecEnv) -> "EpisodeStats":
    """EpisodeStats wired to whatever the task reports: detailed_reward
    terms (ac_base.py:104-114) and cfg.info_track_keys with their modes
    (reference cfg default.yaml:32-35, ac_base.py:54-59)."""
    info = probe_info(env)
    detailed = tuple(sorted(info["detailed_reward"])) if "detailed_reward" in info else ()
    info_keys, info_modes = [], []
    if cfg.info_track_keys:
        modes = cfg.info_track_step or ("last",) * len(cfg.info_track_keys)
        for k, m in zip(cfg.info_track_keys, modes):
            if k in info:
                info_keys.append(k)
                info_modes.append(m)
    return EpisodeStats.create(
        env.num_envs,
        cfg.algo.tracker_len,
        detailed_keys=detailed,
        info_keys=tuple(info_keys),
        info_modes=tuple(info_modes),
    )


def build_actor(cfg, env: VecEnv):
    """Instantiate the policy from cfg.algo.act_class (ac_base.py:28-31)."""
    cls = get_model(cfg.algo.act_class)
    return cls(act_dim=env.action_dim, dtype=compute_dtype(cfg))


def build_critic(cfg, env: VecEnv):
    """Instantiate the critic from cfg.algo.cri_class (ac_base.py:41-42).

    Mirrors the PQL-D name rewrite: distl=True prepends 'Distributional'
    (reference pql/algo/pql_v_learner.py:30-31).
    """
    name = cfg.algo.cri_class
    if cfg.algo.distl and "Distributional" not in name:
        name = "Distributional" + name
    cls = get_model(name)
    kwargs: dict[str, Any] = {"dtype": compute_dtype(cfg)}
    if "Distributional" in name:
        kwargs.update(v_min=cfg.algo.v_min, v_max=cfg.algo.v_max, num_atoms=cfg.algo.num_atoms)
    return cls(**kwargs)


def build_optimizer(lr: float, max_grad_norm: float | None) -> optax.GradientTransformation:
    """AdamW + grad-norm clip, matching torch AdamW defaults
    (weight_decay=0.01; reference ac_base.py:43-44, optimizer_update
    ac_base.py:121-130)."""
    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    if max_grad_norm is not None:
        return optax.chain(optax.clip_by_global_norm(max_grad_norm), tx)
    return tx


def exploration_policy(cfg, actor_module) -> Callable:
    """Builds action_fn(params, obs_normalized, rng, random, step) for
    off-policy exploration, reproducing PQLActor.get_actions
    (pql_actor.py:69-85): deterministic actor + fixed/mixed noise, or
    uniform random warm-up actions in [-1, 1] (pql_actor.py:100-102).

    ``step`` is the training-iteration index driving noise decay
    (cfg.algo.noise.decay = 'linear'|'exp'). The reference constructs the
    same schedulers (pql_actor.py:44-54, schedule_util.py:4-46) but never
    calls ``update_noise()``, so its decay is inert; here the schedule is
    evaluated functionally at the iteration index, which both honors the
    config and stays jit-pure. With decay=None the std is the static
    std_max — bit-identical to the undecayed path. For 'mixed' noise the
    *upper* band decays toward std_min (the reference only ever applies
    get_noise_std() to 'fixed' noise, ddpg.py:52-68)."""
    noise = cfg.algo.noise

    def action_fn(
        params, obs_n, rng, *, random: bool, num_envs_global: int, global_start=0, step=0
    ):
        k_act, k_noise = jax.random.split(rng)
        if random:
            shape = (obs_n.shape[0], actor_module.act_dim)
            return jax.random.uniform(k_act, shape, jnp.float32, -1.0, 1.0)
        act = actor_module.apply(params, obs_n)
        std_hi = schedule_value(noise, step)
        if noise.type == "fixed":
            return add_normal_noise(k_noise, act, std_hi, out_bounds=(-1.0, 1.0))
        if noise.type == "mixed":
            return add_mixed_normal_noise(
                k_noise,
                act,
                noise.std_min,
                std_hi,
                out_bounds=(-1.0, 1.0),
                num_envs_global=num_envs_global,
                global_start=global_start,
            )
        raise NotImplementedError(noise.type)

    return action_fn


def target_policy_actions(cfg, actor_module, params, next_obs, rng):
    """Target-policy smoothing (reference ddpg.py:71-79 /
    pql_v_learner.py:62-71): actor(next_obs) + clipped noise, clipped to
    the action bounds."""
    act = actor_module.apply(params, next_obs)
    b = cfg.algo.noise.tgt_pol_noise_bound
    return add_normal_noise(
        rng, act, cfg.algo.noise.tgt_pol_std, noise_bounds=(-b, b), out_bounds=(-1.0, 1.0)
    )


@struct.dataclass
class RolloutCarry:
    env_state: Any
    obs: jax.Array
    obs_rms: RunningMeanStd
    stats: EpisodeStats
    rng: jax.Array


def rollout(
    env: VecEnv,
    cfg,
    action_fn: Callable,
    actor_params,
    carry: RolloutCarry,
    horizon: int,
    random: bool,
    axis_name: str | None = None,
    num_envs_global: int | None = None,
    global_start=0,
    step=0,
):
    """Collect `horizon` lockstep steps (reference explore_env,
    pql_actor.py:87-127). Returns (carry, traj) with traj fields
    [T, E, ...]; rewards pre-scaled by reward_scale, dones already passed
    through handle_timeout — ready for n-step staging.

    When axis_name is set (inside shard_map), the obs-rms update merges
    moments across shards so normalization is identical to the unsharded
    run.
    """
    num_envs_global = num_envs_global or env.num_envs

    def step_fn(c: RolloutCarry, _):
        rng, k_act, k_env = jax.random.split(c.rng, 3)
        if cfg.algo.obs_norm:
            if axis_name is None:
                obs_rms = c.obs_rms.update(c.obs)
            else:
                obs_rms = c.obs_rms.update_sharded(c.obs, axis_name)
            obs_n = obs_rms.normalize(c.obs)
        else:
            obs_rms = c.obs_rms
            obs_n = c.obs
        action = action_fn(
            actor_params,
            obs_n,
            k_act,
            random=random,
            num_envs_global=num_envs_global,
            global_start=global_start,
            step=step,
        )
        env_state, next_obs, reward, done, info = env.step(c.env_state, action, k_env)
        stats = c.stats.update(reward, done, info)
        done_b = handle_timeout(done, info) if cfg.algo.handle_timeout else done
        out = dict(
            obs=c.obs,
            action=action,
            reward=(cfg.algo.reward_scale * reward)[..., None],
            next_obs=next_obs,
            done=done_b[..., None],
        )
        return (
            RolloutCarry(env_state=env_state, obs=next_obs, obs_rms=obs_rms, stats=stats, rng=rng),
            out,
        )

    return jax.lax.scan(step_fn, carry, None, length=horizon)


def init_actor_critic(cfg, env: VecEnv, rng):
    """Initialize actor/critic modules + params + optimizers."""
    actor = build_actor(cfg, env)
    critic = build_critic(cfg, env)
    k_a, k_c = jax.random.split(rng)
    dummy_obs = jnp.zeros((1, env.obs_dim))
    dummy_act = jnp.zeros((1, env.action_dim))
    actor_params = actor.init(k_a, dummy_obs)
    # state-value critics take obs only
    if cfg.algo.cri_class == "MLPCritic" and not cfg.algo.distl:
        critic_params = critic.init(k_c, dummy_obs)
    else:
        try:
            critic_params = critic.init(k_c, dummy_obs, dummy_act)
        except TypeError:
            critic_params = critic.init(k_c, dummy_obs)
    actor_tx = build_optimizer(cfg.algo.actor_lr, cfg.algo.max_grad_norm)
    critic_tx = build_optimizer(cfg.algo.critic_lr, cfg.algo.max_grad_norm)
    return (
        actor,
        critic,
        actor_params,
        critic_params,
        actor_tx,
        critic_tx,
        actor_tx.init(actor_params),
        critic_tx.init(critic_params),
    )
