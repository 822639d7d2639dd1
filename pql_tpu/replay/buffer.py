"""On-HBM circular replay buffer as an immutable pytree.

Reproduces the semantics of the reference GPU-resident flat ring buffer
(reference pql/replay/simple_replay.py:21-104): preallocated storage,
wrap-around writes, uniform random sampling — re-laid-out for TPU:

- Storage is ONE array [slots, envs, D] with all transition fields
  (obs ∥ action ∥ reward ∥ next_obs ∥ done ∥ extras) packed along the
  feature axis. The reference keeps separate tensors per field
  (simple_replay.py:4-18); packing them means a sampled batch is a SINGLE
  row-gather instead of five, and the ring write is a single
  dynamic-update-slice. On TPU this is the difference between ~1 and ~5+
  latency-bound gather kernels per update — and, just as important, it
  gives XLA exactly one producer (DUS) and one consumer (row gather) of
  the multi-hundred-MB buffer, so layout assignment keeps ONE layout and
  no full-buffer layout-conversion copies appear at loop boundaries
  (profiled: 4.2 ms/iter of such copies with the per-field dict layout).
- The **env axis is shardable over the mesh**, so each device keeps its
  own shard of the 5e6-transition buffer in local HBM and sampling never
  crosses chips (the reference keeps the whole buffer on the learner GPU,
  pql/algo/pql_v_learner.py:50-53).
- Writes are whole env-rows per time slot: adding a [T, E, ...] trajectory
  chunk advances the slot ring by T; XLA aliases the DUS in place even as
  a loop carry.
- A ``valid_start`` watermark excludes the first (nstep-1) slots written
  while the n-step FIFO was still filling (the reference instead skips
  those emissions host-side, pql/replay/nstep_replay.py:44-45); once the
  ring wraps, every slot is valid.

Capacity accounting: ``slots = capacity // num_envs_global`` matches the
reference's flat ``capacity`` transitions (pql_algo.yaml:7: 5e6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayState:
    """Ring storage for one (possibly per-shard) slice of the buffer.

    ``data`` is [slots, envs_local, D]; ``layout`` maps field name →
    (start, dim) column ranges. Canonical fields for off-policy agents:
    obs, action, reward, next_obs, done.
    """

    data: jax.Array
    ptr: jax.Array  # int32 — next slot to write
    total_writes: jax.Array  # int32 — slots written since creation
    slots: int = struct.field(pytree_node=False)
    layout: tuple = struct.field(pytree_node=False, default=())  # ((name, start, dim), ...)
    valid_start_init: int = struct.field(pytree_node=False, default=0)

    @property
    def filled(self) -> jax.Array:
        return jnp.minimum(self.total_writes, self.slots)

    @property
    def valid_start(self) -> jax.Array:
        # garbage prefix exists only until the ring wraps for the first time
        wrapped = self.total_writes > self.slots
        return jnp.where(wrapped, 0, self.valid_start_init).astype(jnp.int32)

    def field_range(self, name: str) -> tuple[int, int]:
        for n, s, d in self.layout:
            if n == name:
                return s, d
        raise KeyError(f"replay field {name!r}; have {[n for n, _, _ in self.layout]}")

    def field(self, name: str) -> jax.Array:
        """[slots, envs, dim] view of one packed field (tests/inspection)."""
        s, d = self.field_range(name)
        return self.data[..., s : s + d]


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

    obs_dtype=bfloat16 halves the buffer footprint (the analog of the
    reference's fp16 ``reserve_space`` option, simple_replay.py:8-15);
    with packed storage the WHOLE transition is stored at that dtype
    (actions are in [-1,1] and rewards pre-scaled, so bf16's 8-bit
    mantissa is ample; done flags are exact).
    """
    dims = [("obs", obs_dim), ("action", action_dim), ("reward", reward_dim),
            ("next_obs", obs_dim), ("done", 1)]
    for name, dim in (extra_fields or {}).items():
        dims.append((name, dim))
    layout, start = [], 0
    for name, dim in dims:
        layout.append((name, start, dim))
        start += dim
    if start < 64:
        # Lane padding: TPU tiles the minor dim to 128 lanes; a packed row
        # far below that (Cartpole: D=11) makes EVERY ring write and
        # batch gather pad — per-op traces show 0.84 ms/iter of pure
        # `pad` ops plus extra fusion time on the narrow-row configs
        # (PERF.md round-5 attribution). Zero columns up to 64 keep the
        # tiles half-full; rows ≥64 are left exactly as-is (their
        # programs — and compile-cache entries — stay byte-identical).
        start = 64
    return ReplayState(
        data=jnp.zeros((slots, num_envs, start), obs_dtype),
        ptr=jnp.zeros((), jnp.int32),
        total_writes=jnp.zeros((), jnp.int32),
        slots=slots,
        layout=tuple(layout),
        valid_start_init=valid_start,
    )


def _pack(state: ReplayState, rows: dict[str, jax.Array]) -> jax.Array:
    """Concatenate a field dict into packed [T, E, D] rows (layout order),
    zero-filling any lane-padding columns (see create_replay)."""
    parts = []
    for name, _s, d in state.layout:
        v = rows[name]
        if v.ndim == 2:  # [T, E] scalar field
            v = v[..., None]
        parts.append(v.astype(state.data.dtype))
    packed = jnp.concatenate(parts, axis=-1)
    pad = state.data.shape[-1] - packed.shape[-1]
    if pad:
        packed = jnp.pad(packed, ((0, 0), (0, 0), (0, pad)))
    return packed


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
    packed = _pack(state, rows)
    t = packed.shape[0]
    if state.slots % t == 0:
        data = jax.lax.dynamic_update_slice_in_dim(state.data, packed, state.ptr, axis=0)
    else:  # fallback: modular scatter (arbitrary T)
        idx = (state.ptr + jnp.arange(t, dtype=jnp.int32)) % state.slots
        data = state.data.at[idx].set(packed)
    return state.replace(
        data=data,
        ptr=(state.ptr + t) % state.slots,
        total_writes=state.total_writes + t,
    )


def replay_slots(memory_size: int, num_envs: int, write_len: int = 1) -> int:
    """Ring depth for a target transition capacity, rounded DOWN to a
    multiple of the per-call write length so writes never wrap mid-chunk
    (see replay_add)."""
    slots = max(int(memory_size) // num_envs, 1)
    return max((slots // write_len) * write_len, write_len)


def _split_fields(state, batch, fields):
    """Slice requested packed columns back into a field dict (free: static
    strided slices of the gathered [B, D] rows)."""
    out = {}
    for name in fields:
        s, d = state.field_range(name)
        out[name] = batch[..., s : s + d].astype(jnp.float32)
    return out


def replay_sample(
    state: ReplayState,
    rng: jax.Array,
    batch_size: int,
    fields: tuple[str, ...] = ("obs", "action", "reward", "next_obs", "done"),
    sample_slots: int = 0,
) -> dict[str, jax.Array]:
    """Uniform sample of batch_size transitions (simple_replay.py:85-104).

    sample_slots == 0: independent (slot, env) pairs — the reference's
    exact iid scheme. With packed storage this is ONE row-gather of
    batch_size ~300-byte rows (latency-bound, ~10 ns/row on TPU) instead
    of five per-field gathers that XLA decomposes into per-feature-column
    scalar gathers (profiled at ~83 µs EACH, dominating the critic phase).

    sample_slots == n > 0: slot-stratified window — draw n random slots,
    row-gather their [E, D] slabs (sequential HBM reads), then take a
    shared random circular window of batch/n consecutive envs from each.
    Every (slot, env) pair keeps the same uniform marginal probability
    (slot uniform; window offset uniform over the full env ring); the
    statistical difference is within-batch correlation (n distinct
    timesteps, windowed env runs), which 8192-sized PQL batches absorb.
    Trades scattered reads for streaming bandwidth.

    On a sharded buffer this is called per-shard with a per-shard batch —
    statistically identical to a global sample because env shards are iid.
    """
    num_envs = state.data.shape[1]
    lo = state.valid_start
    span = jnp.maximum(state.filled - lo, 1)
    per = batch_size // max(sample_slots, 1)
    if sample_slots and batch_size % sample_slots == 0 and per <= num_envs:
        k_slot, k_off = jax.random.split(rng)
        slots = lo + (jax.random.randint(k_slot, (sample_slots,), 0, 1 << 30) % span)
        rows = state.data[slots]  # [n, E, D] — contiguous slabs
        # shared circular env window: offset uniform over [0, E) keeps the
        # per-env marginal exactly uniform; wraparound via self-concat
        off = jax.random.randint(k_off, (), 0, num_envs)
        ext = jnp.concatenate([rows, rows[:, :per]], axis=1)
        win = jax.lax.dynamic_slice_in_dim(ext, off, per, axis=1)
        return _split_fields(state, win.reshape(batch_size, -1), fields)
    k_slot, k_env = jax.random.split(rng)
    slot_idx = lo + (jax.random.randint(k_slot, (batch_size,), 0, 1 << 30) % span)
    env_idx = jax.random.randint(k_env, (batch_size,), 0, num_envs)
    flat = state.data.reshape(state.slots * num_envs, -1)
    batch = flat[slot_idx * num_envs + env_idx]  # ONE [B, D] row gather
    return _split_fields(state, batch, fields)
