"""N-step transition staging.

Converts per-step transitions into n-step transitions with early-done
masking, reproducing the semantics of the reference FIFO + TorchScript
kernel (reference pql/replay/nstep_replay.py:6-92) exactly:

for each env, over the current depth-n window (oldest → newest):
- obs/action come from the oldest entry,
- reward = Σ_{i≤k} γ^i·r_i where k = index of the first done (or n-1),
- next_obs = next_obs at step k,
- done = whether any step in the window was done.

The reference's where/unique_consecutive/argmax scatter logic
(nstep_replay.py:74-92) becomes branch-free vectorized masking, which is
what the TPU VPU wants. The FIFO persists across explore calls (the
reference keeps ``nstep_count`` across horizons, nstep_replay.py:22,44),
so emission validity is tracked with a running count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class NStepState:
    """Depth-n FIFO over the env axis: arrays [n, E, ...], oldest first."""

    obs: jax.Array
    action: jax.Array
    reward: jax.Array  # [n, E, 1]
    next_obs: jax.Array
    done: jax.Array  # [n, E, 1]
    count: jax.Array  # int32 — total pushes so far
    nstep: int = struct.field(pytree_node=False)
    gamma: float = struct.field(pytree_node=False)


def create_nstep(
    num_envs: int,
    obs_dim: int,
    action_dim: int,
    nstep: int = 3,
    gamma: float = 0.99,
    reward_dim: int = 1,
) -> NStepState:
    """reward_dim > 1 carries extra per-agent channels through the n-step
    reduction unchanged in semantics (the reference threads a separate
    ``reward_left`` tensor through the same kernel, nstep_replay.py:25-27,
    41-42, 57-63)."""
    n = nstep
    return NStepState(
        obs=jnp.zeros((n, num_envs, obs_dim), jnp.float32),
        action=jnp.zeros((n, num_envs, action_dim), jnp.float32),
        reward=jnp.zeros((n, num_envs, reward_dim), jnp.float32),
        next_obs=jnp.zeros((n, num_envs, obs_dim), jnp.float32),
        done=jnp.zeros((n, num_envs, 1), jnp.float32),
        count=jnp.zeros((), jnp.int32),
        nstep=nstep,
        gamma=gamma,
    )


def _fifo_shift(buf: jax.Array, new_row: jax.Array) -> jax.Array:
    """Drop oldest, append newest (nstep_replay.py:69-71)."""
    return jnp.concatenate([buf[1:], new_row[None]], axis=0)


def nstep_return(state: NStepState):
    """The n-step reduction over the current window (nstep_replay.py:74-92)."""
    n = state.nstep
    dones = state.done[..., 0] > 0.5  # [n, E]
    any_done = jnp.any(dones, axis=0)  # [E]
    first_done = jnp.argmax(dones, axis=0)  # [E]; 0 when none, gated below
    k = jnp.where(any_done, first_done, n - 1)  # [E]

    steps = jnp.arange(n)[:, None, None]  # [n, 1, 1]
    mask = (steps <= k[None, :, None]).astype(state.reward.dtype)  # [n, E, 1]
    gammas = (state.gamma ** jnp.arange(n, dtype=state.reward.dtype))[:, None, None]
    reward = jnp.sum(state.reward * gammas * mask, axis=0)  # [E, C]

    next_obs = jnp.take_along_axis(state.next_obs, k[None, :, None], axis=0)[0]  # [E,d]
    done = jnp.maximum(state.done[-1], any_done[:, None].astype(state.done.dtype))
    return reward, next_obs, done


def nstep_push(state: NStepState, obs, action, reward, next_obs, done):
    """Push one env-step; emit the n-step transition for the oldest entry.

    Returns (new_state, out: dict, valid: bool scalar). ``valid`` is False
    while the FIFO is still filling (count < n), matching the reference's
    skipped emissions (nstep_replay.py:44-45). For nstep == 1 the push is a
    passthrough (nstep_replay.py:66-67).
    """
    reward = reward.reshape(reward.shape[0], -1)
    done = done.reshape(done.shape[0], 1).astype(jnp.float32)
    if state.nstep == 1:
        out = dict(obs=obs, action=action, reward=reward, next_obs=next_obs, done=done)
        return state.replace(count=state.count + 1), out, jnp.asarray(True)

    new_state = state.replace(
        obs=_fifo_shift(state.obs, obs),
        action=_fifo_shift(state.action, action),
        reward=_fifo_shift(state.reward, reward),
        next_obs=_fifo_shift(state.next_obs, next_obs),
        done=_fifo_shift(state.done, done),
        count=state.count + 1,
    )
    n_reward, n_next_obs, n_done = nstep_return(new_state)
    out = dict(
        obs=new_state.obs[0],
        action=new_state.action[0],
        reward=n_reward,
        next_obs=n_next_obs,
        done=n_done,
    )
    valid = new_state.count >= state.nstep
    return new_state, out, valid


def nstep_scan(state: NStepState, traj: dict[str, jax.Array]):
    """Push a [T, E, ...] trajectory; returns stacked [T, E, ...] emissions
    plus a [T] validity mask (the functional analog of
    NStepReplay.add_to_buffer over a horizon, nstep_replay.py:30-67)."""

    def body(s, step):
        s, out, valid = nstep_push(
            s, step["obs"], step["action"], step["reward"], step["next_obs"], step["done"]
        )
        return s, (out, valid)

    state, (outs, valids) = jax.lax.scan(body, state, traj)
    return state, outs, valids
