"""DDPGV — off-policy visual DDPG training through the C++ host ring.

The reference keeps vision-scale replay on CPU: ``create_buffer``'s
``reserve_space`` stores observations as fp16 host tensors while the GPU
trains on sampled batches (reference pql/replay/simple_replay.py:8-15).
This agent is the TPU-native analog of that pathway, wired end to end:

- the SIM phase is one jitted program (physics + splat rendering +
  exploration noise, pql_tpu/envs/vision.py) producing a horizon chunk of
  uint8 frames + fp16 proprio/pointcloud/privileged-state rows;
- the chunk is written into :class:`pql_tpu.native.HostReplay` — the
  multi-threaded C++ ring (native/host_ring.cpp) holding uint8/fp16 rows
  in host RAM, where capacity is ~100x cheaper than HBM;
- each update samples a [batch] block via the native gather,
  ``jax.device_put``s ONE contiguous array per field, and runs a jitted
  DDPG update: privileged-state Double-Q critic (the vision-agent critic
  design of reference ppoV.py:42) + DPG actor through the frame encoder.

Everything device-side stays jitted; the host hop per iteration is the
same traffic the reference pays between its CPU obs store and the GPU.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from pql_tpu.algos import base
from pql_tpu.envs.base import VecEnv
from pql_tpu.models import get_model
from pql_tpu.models.visual import DiagGaussianMLPVPolicy
from pql_tpu.ops import RunningMeanStd, add_mixed_normal_noise, soft_update
from pql_tpu.utils.trackers import Tracker


@struct.dataclass
class DDPGVState:
    actor_params: Any
    actor_opt: Any
    critic_params: Any
    critic_opt: Any
    critic_target: Any
    obs_rms: RunningMeanStd
    env_state: Any
    obs: jax.Array
    cur_returns: jax.Array
    cur_lengths: jax.Array
    return_tracker: Tracker
    len_tracker: Tracker
    rng: jax.Array
    env_steps: jax.Array


class DDPGV:
    """Visual DDPG with host-RAM (C++ ring) replay."""

    name = "DDPGV"

    def __init__(self, cfg, env: VecEnv):
        task = env.task
        if not hasattr(task, "render"):
            raise ValueError("DDPGV needs a camera task (render/proprio/pointcloud)")
        self.cfg = cfg
        self.env = env
        dtype = base.compute_dtype(cfg)
        self.actor = DiagGaussianMLPVPolicy(
            act_dim=env.action_dim,
            num_cams=getattr(task, "num_cams", 1),
            encoder_type="resnet",
            feature_dim=256,
            hidden_dim=256,
            dtype=dtype,
        )
        self.critic = get_model(cfg.algo.cri_class)(dtype=dtype)
        self.actor_tx = base.build_optimizer(cfg.algo.actor_lr, cfg.algo.max_grad_norm)
        self.critic_tx = base.build_optimizer(cfg.algo.critic_lr, cfg.algo.max_grad_norm)

        spec = task.visual_spec
        self.img_shape = tuple(spec["img"])  # [cams, T, H, W, 3]
        self.pc_shape = tuple(spec["pc"])
        self.proprio_dim = int(spec["proprio"])
        img_dim = int(np.prod(self.img_shape))
        pc_dim = int(np.prod(self.pc_shape))

        # host-side ring: uint8 frames, fp16 everything else (the
        # reference's reserve_space dtype policy, simple_replay.py:8-15)
        from pql_tpu.native.host_replay import HostReplay

        slots = max(int(cfg.algo.memory_size) // env.num_envs, 2)
        fields = dict(
            img=img_dim,
            next_img=img_dim,
            proprio=self.proprio_dim,
            next_proprio=self.proprio_dim,
            pc=pc_dim,
            next_pc=pc_dim,
            obs=env.obs_dim,
            next_obs=env.obs_dim,
            action=env.action_dim,
            reward=1,
            done=1,
        )
        dtypes = {k: np.float16 for k in fields}
        dtypes["img"] = dtypes["next_img"] = np.uint8
        self.replay = HostReplay(slots, env.num_envs, fields, dtypes)

        # no donation: DDPGVState holds intentionally-aliased buffers
        # (target=copy aside, tracker/counter zeros), and the nets are
        # small enough that double-buffering is free
        self._collect = jax.jit(self._collect_impl, static_argnames=("random",))
        self._update = jax.jit(self._update_impl)
        self.train_iter = self._train_iter  # host-orchestrated (ring I/O)

    # ------------------------------------------------------------- helpers

    def _visual(self, env_state):
        task = self.env.task
        img = jax.vmap(task.render)(env_state.state)
        proprio = jax.vmap(task.proprio)(env_state.state)
        pc = jax.vmap(task.pointcloud)(env_state.state)
        return img, proprio, pc

    def _act(self, actor_params, img, proprio, pc):
        mean, _ = self.actor.apply(actor_params, img, proprio, pc)
        return jnp.tanh(mean)

    # ---------------------------------------------------------------- init

    def init(self, rng) -> DDPGVState:
        cfg, env = self.cfg, self.env
        k_a, k_c, k_env, k_loop = jax.random.split(rng, 4)
        env_state, obs = env.reset(k_env)
        img, proprio, pc = self._visual(env_state)
        actor_params = self.actor.init(k_a, img, proprio, pc)
        critic_params = self.critic.init(
            k_c, jnp.zeros((1, env.obs_dim)), jnp.zeros((1, env.action_dim))
        )
        zeros = jnp.zeros(env.num_envs, jnp.float32)
        return DDPGVState(
            actor_params=actor_params,
            actor_opt=self.actor_tx.init(actor_params),
            critic_params=critic_params,
            critic_opt=self.critic_tx.init(critic_params),
            # fresh buffers: _collect/_update donate the state, and a
            # target aliasing critic_params would be donated twice
            critic_target=jax.tree_util.tree_map(jnp.copy, critic_params),
            obs_rms=RunningMeanStd.create((env.obs_dim,)),
            env_state=env_state,
            obs=obs,
            cur_returns=zeros,
            cur_lengths=zeros,
            return_tracker=Tracker.create(cfg.algo.tracker_len),
            len_tracker=Tracker.create(cfg.algo.tracker_len),
            rng=k_loop,
            env_steps=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------- collect

    def _collect_impl(self, state: DDPGVState, random: bool = False):
        """One horizon chunk: jitted sim+render; returns the trajectory
        fields to be written into the host ring ([T, E, dim], quantized)."""
        cfg, env = self.cfg, self.env

        def sim_step(carry, _):
            env_state, obs, obs_rms, cur_ret, cur_len, k = carry
            k, k_a, k_n, k_e = jax.random.split(k, 4)
            img, proprio, pc = self._visual(env_state)
            if cfg.algo.obs_norm:
                obs_rms = obs_rms.update(obs)
            if random:
                action = jax.random.uniform(
                    k_a, (env.num_envs, env.action_dim), jnp.float32, -1.0, 1.0
                )
            else:
                action = add_mixed_normal_noise(
                    k_n,
                    self._act(state.actor_params, img, proprio, pc),
                    cfg.algo.noise.std_min,
                    cfg.algo.noise.std_max,
                    out_bounds=(-1.0, 1.0),
                    num_envs_global=env.num_envs,
                )
            env_state, next_obs, reward, done, info = env.step(env_state, action, k_e)
            n_img, n_proprio, n_pc = self._visual(env_state)
            cur_ret = cur_ret + reward
            cur_len = cur_len + 1.0
            done_mask = done > 0.5
            events = (cur_ret, cur_len, done)
            cur_ret = jnp.where(done_mask, 0.0, cur_ret)
            cur_len = jnp.where(done_mask, 0.0, cur_len)
            out = dict(
                img=jnp.round(img * 255.0).astype(jnp.uint8).reshape(env.num_envs, -1),
                next_img=jnp.round(n_img * 255.0)
                .astype(jnp.uint8)
                .reshape(env.num_envs, -1),
                proprio=proprio.astype(jnp.float16),
                next_proprio=n_proprio.astype(jnp.float16),
                pc=pc.astype(jnp.float16).reshape(env.num_envs, -1),
                next_pc=n_pc.astype(jnp.float16).reshape(env.num_envs, -1),
                obs=obs.astype(jnp.float16),
                next_obs=next_obs.astype(jnp.float16),
                action=action.astype(jnp.float16),
                reward=(cfg.algo.reward_scale * reward).astype(jnp.float16)[:, None],
                done=done.astype(jnp.float16)[:, None],
            )
            return (env_state, next_obs, obs_rms, cur_ret, cur_len, k), (out, events)

        rng, k_roll = jax.random.split(state.rng)
        carry = (
            state.env_state, state.obs, state.obs_rms,
            state.cur_returns, state.cur_lengths, k_roll,
        )
        carry, (traj, events) = jax.lax.scan(
            sim_step, carry, None, length=cfg.algo.horizon_len
        )
        env_state, obs, obs_rms, cur_ret, cur_len, _ = carry
        ep_ret, ep_len, dones = events
        state = state.replace(
            env_state=env_state,
            obs=obs,
            obs_rms=obs_rms,
            cur_returns=cur_ret,
            cur_lengths=cur_len,
            return_tracker=state.return_tracker.update(
                ep_ret.reshape(-1), dones.reshape(-1) > 0.5
            ),
            len_tracker=state.len_tracker.update(
                ep_len.reshape(-1), dones.reshape(-1) > 0.5
            ),
            rng=rng,
            env_steps=state.env_steps + cfg.algo.horizon_len * env.num_envs,
        )
        return state, traj

    # -------------------------------------------------------------- update

    def _update_impl(self, state: DDPGVState, batch, k):
        cfg = self.cfg

        def norm(x):
            return state.obs_rms.normalize_clip(x) if cfg.algo.obs_norm else x

        img = batch["img"].astype(jnp.float32).reshape((-1,) + self.img_shape) / 255.0
        n_img = (
            batch["next_img"].astype(jnp.float32).reshape((-1,) + self.img_shape)
            / 255.0
        )
        pc = batch["pc"].astype(jnp.float32).reshape((-1,) + self.pc_shape)
        n_pc = batch["next_pc"].astype(jnp.float32).reshape((-1,) + self.pc_shape)
        proprio = batch["proprio"].astype(jnp.float32)
        n_proprio = batch["next_proprio"].astype(jnp.float32)
        obs = norm(batch["obs"].astype(jnp.float32))
        next_obs = norm(batch["next_obs"].astype(jnp.float32))
        action = batch["action"].astype(jnp.float32)
        reward = batch["reward"].astype(jnp.float32)
        done = batch["done"].astype(jnp.float32)

        from pql_tpu.ops import add_normal_noise

        b = cfg.algo.noise.tgt_pol_noise_bound
        next_action = add_normal_noise(
            k,
            self._act(state.actor_params, n_img, n_proprio, n_pc),
            cfg.algo.noise.tgt_pol_std,
            noise_bounds=(-b, b),
            out_bounds=(-1.0, 1.0),
        )
        q_next = self.critic.apply(
            state.critic_target, next_obs, next_action, method=type(self.critic).q_min
        )
        target = jax.lax.stop_gradient(
            reward + (1.0 - done) * cfg.algo.gamma * q_next
        )

        def critic_loss_fn(p):
            q1, q2 = self.critic.apply(p, obs, action)
            return jnp.mean(jnp.square(q1 - target)) + jnp.mean(jnp.square(q2 - target))

        c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(state.critic_params)
        c_up, critic_opt = self.critic_tx.update(
            c_grads, state.critic_opt, state.critic_params
        )
        critic_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.critic_params, c_up
        )
        critic_target = soft_update(state.critic_target, critic_params, cfg.algo.tau)

        def actor_loss_fn(p):
            a = self._act(p, img, proprio, pc)
            q = self.critic.apply(
                jax.lax.stop_gradient(critic_params), obs, a,
                method=type(self.critic).q_min,
            )
            return -jnp.mean(q)

        a_loss, a_grads = jax.value_and_grad(actor_loss_fn)(state.actor_params)
        a_up, actor_opt = self.actor_tx.update(
            a_grads, state.actor_opt, state.actor_params
        )
        actor_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.actor_params, a_up
        )
        state = state.replace(
            actor_params=actor_params,
            actor_opt=actor_opt,
            critic_params=critic_params,
            critic_opt=critic_opt,
            critic_target=critic_target,
        )
        return state, jnp.stack([c_loss, a_loss])

    # ---------------------------------------------------------- iteration

    def _ring_write(self, traj) -> None:
        self.replay.add({k: np.asarray(v) for k, v in traj.items()})

    def warmup(self, state: DDPGVState):
        state, traj = self._collect(state, random=True)
        self._ring_write(traj)
        return state, {}

    def _train_iter(self, state: DDPGVState):
        cfg = self.cfg
        state, traj = self._collect(state)
        self._ring_write(traj)
        losses = []
        for _ in range(int(cfg.algo.update_times)):
            batch_np = self.replay.sample(cfg.algo.batch_size)
            batch = {k: jax.device_put(v) for k, v in batch_np.items()}
            k = jax.random.fold_in(state.rng, len(losses))
            state, loss = self._update(state, batch, k)
            losses.append(loss)
        losses = jnp.mean(jnp.stack(losses), axis=0)
        metrics = {
            "train/critic_loss": losses[0],
            "train/actor_loss": losses[1],
            "train/return": state.return_tracker.mean(),
            "train/episode_length": state.len_tracker.mean(),
            "train/success_rate": jnp.zeros(()),
        }
        return state, metrics

    # ---------------------------------------------------------- eval hook

    def eval_actor_apply(self, params, obs_n, env_state=None):
        img, proprio, pc = self._visual(env_state)
        return self._act(params, img, proprio, pc)

    eval_actor_apply.needs_env_state = True
