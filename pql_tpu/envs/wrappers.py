"""Environment wrappers (reference pql/wrappers/).

The reference wraps Isaac Gym envs with ResetEnvWrapper (force-reset
semantics: set reset_buf, step zero actions, then reset — reference
pql/wrappers/reset.py:14-22) and FlatObEnvWrapper (Dict obs → obs['obs'],
pql/wrappers/flatten_ob.py:12-25). In this framework those behaviors are
built into VecEnv (reset() force-resets every env; tasks return flat
obs), so these wrappers exist for tasks that need the adapters:

- ``FlatObTask`` flattens a dict-observation task to the flat Task
  protocol (and remembers the key layout so policies can recover views),
- ``ClipActionTask`` clips incoming actions to [-1, 1] (the implicit
  contract the reference relies on Isaac Gym enforcing).

They compose as Task → Task, so any wrapper stack still vmaps/shards
through VecEnv unchanged.
"""

from __future__ import annotations

import jax.numpy as jnp


class FlatObTask:
    """Flatten a task whose get_obs returns a dict of 1-D arrays
    (reference FlatObEnvWrapper semantics: the agent sees one vector)."""

    def __init__(self, task, keys: tuple[str, ...] | None = None):
        self._task = task
        probe = task.get_obs(task.init_state(__import__("jax").random.PRNGKey(0)))
        if not isinstance(probe, dict):
            raise ValueError("FlatObTask expects a dict-observation task")
        self.keys = tuple(keys or sorted(probe))
        self.slices = {}
        start = 0
        for k in self.keys:
            d = int(probe[k].shape[-1])
            self.slices[k] = (start, start + d)
            start += d
        self.obs_dim = start
        self.action_dim = task.action_dim
        self.max_episode_length = task.max_episode_length

    def init_state(self, rng):
        return self._task.init_state(rng)

    def _flatten(self, obs_dict):
        return jnp.concatenate([obs_dict[k] for k in self.keys], axis=-1)

    def get_obs(self, state):
        return self._flatten(self._task.get_obs(state))

    def dynamics(self, state, action, rng):
        return self._task.dynamics(state, action, rng)


class ClipActionTask:
    """Clip actions to [-1, 1] before the underlying dynamics."""

    def __init__(self, task):
        self._task = task
        self.obs_dim = task.obs_dim
        self.action_dim = task.action_dim
        self.max_episode_length = task.max_episode_length

    def __getattr__(self, name):
        return getattr(self._task, name)

    def dynamics(self, state, action, rng):
        return self._task.dynamics(state, jnp.clip(action, -1.0, 1.0), rng)
