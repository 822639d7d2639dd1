"""On-HBM circular replay buffer as an immutable pytree.

Reproduces the semantics of the reference GPU-resident flat ring buffer
(reference pql/replay/simple_replay.py:21-104): preallocated storage,
wrap-around writes, uniform random sampling — re-laid-out for TPU:

- Storage is [slots, envs, dim] with the **env axis shardable over the
  mesh**, so each device keeps its own shard of the 5e6-transition buffer
  in local HBM and sampling never crosses chips (the reference keeps the
  whole buffer on the learner GPU, pql/algo/pql_v_learner.py:50-53).
- Writes are whole env-rows per time slot: adding a [T, E, ...] trajectory
  chunk advances the slot ring by T. This is the natural layout for
  lockstep vectorized envs and makes the ring write a static
  dynamic-update-slice instead of a scatter.
- A ``valid_start`` watermark excludes the first (nstep-1) slots written
  while the n-step FIFO was still filling (the reference instead skips
  those emissions host-side, pql/replay/nstep_replay.py:44-45); once the
  ring wraps, every slot is valid.

Capacity accounting: ``slots = capacity // num_envs_global`` matches the
reference's flat ``capacity`` transitions (pql_algo.yaml:7: 5e6).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayState:
    """Ring storage for one (possibly per-shard) slice of the buffer.

    ``data`` is a dict of arrays shaped [slots, envs_local, ...]; required
    keys for off-policy agents: obs, action, reward, next_obs, done.
    """

    data: dict[str, jax.Array]
    ptr: jax.Array  # int32 — next slot to write
    total_writes: jax.Array  # int32 — slots written since creation
    slots: int = struct.field(pytree_node=False)
    valid_start_init: int = struct.field(pytree_node=False, default=0)

    @property
    def filled(self) -> jax.Array:
        return jnp.minimum(self.total_writes, self.slots)

    @property
    def valid_start(self) -> jax.Array:
        # garbage prefix exists only until the ring wraps for the first time
        wrapped = self.total_writes > self.slots
        return jnp.where(wrapped, 0, self.valid_start_init).astype(jnp.int32)


def create_replay(
    slots: int,
    num_envs: int,
    obs_dim: int,
    action_dim: int,
    extra_fields: dict[str, int] | None = None,
    obs_dtype=jnp.float32,
    valid_start: int = 0,
    reward_dim: int = 1,
) -> ReplayState:
    """Preallocate ring storage (reference simple_replay.py:4-18).

    reward_dim=2 is the IDDPG layout: channel 0 = right-hand reward,
    channel 1 = left (the reference stores a separate ``reward_left``
    tensor, simple_replay.py:36-38). extra_fields maps name → feature dim
    for further research variants.
    """
    data = {
        "obs": jnp.zeros((slots, num_envs, obs_dim), obs_dtype),
        "action": jnp.zeros((slots, num_envs, action_dim), jnp.float32),
        "reward": jnp.zeros((slots, num_envs, reward_dim), jnp.float32),
        "next_obs": jnp.zeros((slots, num_envs, obs_dim), obs_dtype),
        "done": jnp.zeros((slots, num_envs, 1), jnp.float32),
    }
    for name, dim in (extra_fields or {}).items():
        data[name] = jnp.zeros((slots, num_envs, dim), jnp.float32)
    return ReplayState(
        data=data,
        ptr=jnp.zeros((), jnp.int32),
        total_writes=jnp.zeros((), jnp.int32),
        slots=slots,
        valid_start_init=valid_start,
    )


def replay_add(state: ReplayState, rows: dict[str, jax.Array]) -> ReplayState:
    """Write a [T, E, ...] chunk at the ring pointer with wraparound.

    When ``slots`` is a multiple of T (guaranteed by ``replay_slots``),
    a write never straddles the wrap point, so it lowers to a single
    ``dynamic_update_slice`` — which XLA aliases IN-PLACE even when the
    buffer is a loop carry (a modular scatter instead forces a full copy
    of the multi-hundred-MB buffer on every iteration inside lax.scan).
    The reference's wrap is a host-side two-slice copy
    (simple_replay.py:54-72).
    """
    t = next(iter(rows.values())).shape[0]
    new_data = dict(state.data)
    if state.slots % t == 0:
        for k, v in rows.items():
            new_data[k] = jax.lax.dynamic_update_slice_in_dim(
                state.data[k], v.astype(state.data[k].dtype), state.ptr, axis=0
            )
    else:  # fallback: modular scatter (arbitrary T)
        idx = (state.ptr + jnp.arange(t, dtype=jnp.int32)) % state.slots
        for k, v in rows.items():
            new_data[k] = state.data[k].at[idx].set(v.astype(state.data[k].dtype))
    return state.replace(
        data=new_data,
        ptr=(state.ptr + t) % state.slots,
        total_writes=state.total_writes + t,
    )


def replay_slots(memory_size: int, num_envs: int, write_len: int = 1) -> int:
    """Ring depth for a target transition capacity, rounded DOWN to a
    multiple of the per-call write length so writes never wrap mid-chunk
    (see replay_add)."""
    slots = max(int(memory_size) // num_envs, 1)
    return max((slots // write_len) * write_len, write_len)


def replay_sample(
    state: ReplayState,
    rng: jax.Array,
    batch_size: int,
    fields: tuple[str, ...] = ("obs", "action", "reward", "next_obs", "done"),
    sample_slots: int = 0,
) -> dict[str, jax.Array]:
    """Uniform sample of batch_size transitions (simple_replay.py:85-104).

    sample_slots == 0: independent (slot, env) pairs — the reference's
    exact scheme, but on TPU 8192 scattered ~100-byte reads from a
    multi-GB HBM buffer are latency-bound (~7 ms/iter at the PQL ratios).

    sample_slots == n > 0: slot-stratified — draw n random slots, read
    each slot's whole [E, dim] row SEQUENTIALLY, then pick batch/n random
    envs within each row. Every (slot, env) pair keeps the same uniform
    marginal probability; the only statistical difference is within-batch
    slot correlation (n distinct timesteps instead of ~batch), which the
    8192-sized PQL batches absorb. Trades scattered reads for streaming
    bandwidth — the TPU-idiomatic layout of the same sample.

    On a sharded buffer this is called per-shard with a per-shard batch —
    statistically identical to a global sample because env shards are iid.
    """
    num_envs = state.data["obs"].shape[1]
    lo = state.valid_start
    span = jnp.maximum(state.filled - lo, 1)
    if sample_slots and batch_size % sample_slots == 0:
        per = batch_size // sample_slots
        k_slot, k_env = jax.random.split(rng)
        slots = lo + (jax.random.randint(k_slot, (sample_slots,), 0, 1 << 30) % span)
        env_idx = jax.random.randint(k_env, (sample_slots, per), 0, num_envs)
        out = {}
        for k in fields:
            rows = state.data[k][slots]  # [n, E, d] — contiguous slabs
            v = jnp.take_along_axis(rows, env_idx[..., None], axis=1)
            out[k] = v.reshape(batch_size, -1).astype(jnp.float32)
        return out
    k_slot, k_env = jax.random.split(rng)
    slot_idx = lo + (jax.random.randint(k_slot, (batch_size,), 0, 1 << 30) % span)
    env_idx = jax.random.randint(k_env, (batch_size,), 0, num_envs)
    out = {}
    for k in fields:
        v = state.data[k][slot_idx, env_idx]
        out[k] = v.astype(jnp.float32)
    return out
