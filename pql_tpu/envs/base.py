"""Pure-functional vectorized environment substrate.

The reference steps 4096–16384 lockstep envs on GPU through Isaac Gym
(reference pql/utils/isaacgym_util.py:8-24) wrapped by ResetEnvWrapper /
FlatObEnvWrapper (pql/wrappers/). Here an environment is a *pure function
of state*: single-env dynamics written once, batched with vmap, compiled
under jit, and shardable over the mesh env axis. The wrapper reproduces the
Isaac Gym step contract the algorithms rely on:

- **auto-reset**: when an env terminates or times out, ``step`` returns the
  *new episode's first observation* (IsaacGymEnvs VecTask behavior; the
  reference stores that as next_obs, pql/algo/pql_actor.py:104-117),
- **timeout flag**: ``info['truncated']`` marks episodes ended by the time
  limit, consumed by handle_timeout to bootstrap through timeouts
  (pql/utils/common.py:195-202),
- flat observations (FlatObEnvWrapper, pql/wrappers/flatten_ob.py:12-25).

A Task defines single-env physics; VecEnv owns batching, episode clocks,
and auto-reset. All methods trace under jit; no host round-trips.
"""

from __future__ import annotations

from typing import Any, Protocol

import jax
import jax.numpy as jnp
from flax import struct


class Task(Protocol):
    """Single-env dynamics. All methods are pure and unbatched."""

    obs_dim: int
    action_dim: int
    max_episode_length: int

    def init_state(self, rng: jax.Array) -> Any:
        """Sample a fresh episode's physics state."""

    def get_obs(self, state: Any) -> jax.Array:
        """Observation vector for a state."""

    def dynamics(self, state: Any, action: jax.Array, rng: jax.Array):
        """One physics step: (next_state, reward, terminated, info)."""


@struct.dataclass
class VecEnvState:
    """Env-state pytree. Every leaf has leading axis = env, so the whole
    state shards cleanly on the mesh env axis (PRNG keys are supplied by
    the caller per step, not stored here)."""

    state: Any  # batched task state pytree, leading axis = env
    time: jax.Array  # [E] int32 — steps since episode start


class VecEnv:
    """Batched auto-resetting environment over a Task."""

    def __init__(self, task: Task, num_envs: int):
        self.task = task
        self.num_envs = num_envs
        self.obs_dim = task.obs_dim
        self.action_dim = task.action_dim
        self.max_episode_length = task.max_episode_length
        # two-agent tasks carry a MultiAgentSpec (reference cfg.task.multi)
        self.multi = getattr(task, "multi", None)

    def symmetry_tracker(self, s: "VecEnvState") -> jax.Array:
        """Per-env mirrored-episode flags (reference bimanual envs expose
        env.unwrapped.symmetry_tracker, consumed at pql/algo/ippo.py:81);
        zeros for tasks without episode mirroring."""
        if hasattr(self.task, "get_symmetry"):
            return jax.vmap(self.task.get_symmetry)(s.state)
        return jnp.zeros(self.num_envs, jnp.float32)

    def env_keys(self, rng: jax.Array, global_start=0) -> jax.Array:
        """Per-env PRNG keys derived from each env's GLOBAL index
        (fold_in(rng, global_idx)). Under shard_map, passing the shard's
        global offset makes every env's key — and therefore the whole sim
        stream — bitwise independent of how the env axis is sharded
        (SURVEY §4: 'sharded step == single-device step')."""
        idx = jnp.arange(self.num_envs) + jnp.asarray(global_start, jnp.int32)
        return jax.vmap(lambda i: jax.random.fold_in(rng, i))(idx)

    def reset(self, rng: jax.Array, global_start=0):
        """Fresh episodes for every env (ResetEnvWrapper.reset force-resets
        all envs, pql/wrappers/reset.py:14-19)."""
        keys = self.env_keys(rng, global_start)
        state = jax.vmap(self.task.init_state)(keys)
        obs = jax.vmap(self.task.get_obs)(state)
        return VecEnvState(state=state, time=jnp.zeros(self.num_envs, jnp.int32)), obs

    def step(self, s: VecEnvState, actions: jax.Array, rng: jax.Array, global_start=0):
        """Lockstep batched step with auto-reset.

        Returns (state, obs, reward, done, info) where done includes
        timeouts and info['truncated'] isolates them. ``global_start`` is
        the shard's first global env index (0 when unsharded).
        """
        k_dyn, k_reset = jax.random.split(rng)
        dyn_keys = self.env_keys(k_dyn, global_start)
        next_state, reward, terminated, info = jax.vmap(self.task.dynamics)(
            s.state, actions, dyn_keys
        )
        time = s.time + 1
        truncated = jnp.logical_and(time >= self.max_episode_length, ~terminated)
        done = jnp.logical_or(terminated, truncated)

        # auto-reset: re-init done envs, keep the others
        reset_keys = self.env_keys(k_reset, global_start)
        fresh_state = jax.vmap(self.task.init_state)(reset_keys)
        next_state = jax.tree_util.tree_map(
            lambda fresh, cont: jnp.where(
                done.reshape((-1,) + (1,) * (cont.ndim - 1)), fresh, cont
            ),
            fresh_state,
            next_state,
        )
        time = jnp.where(done, 0, time)
        obs = jax.vmap(self.task.get_obs)(next_state)

        info = dict(info)
        info["truncated"] = truncated
        # numerical-safety: a physics blow-up in one env must not leak NaNs
        # into the replay/normalizer of all envs — the env terminates (task
        # dynamics flag non-finite states as done) and its last reward/obs
        # are sanitized here
        return (
            VecEnvState(state=next_state, time=time),
            jnp.nan_to_num(obs),
            jnp.nan_to_num(reward.astype(jnp.float32)),
            done.astype(jnp.float32),
            info,
        )


def handle_timeout(done: jax.Array, info: dict) -> jax.Array:
    """Bootstrap through timeouts: clear done where truncated
    (reference pql/utils/common.py:195-202)."""
    truncated = info.get("truncated")
    if truncated is None:
        return done
    return done * (1.0 - truncated.astype(done.dtype))
