"""Jit-compatible moving-average trackers.

The reference Tracker is a host-side fixed-length deque fed with the
returns of whichever envs finished an episode this step (reference
pql/utils/common.py:103-126, pql/algo/pql_actor.py:129-147). Here the same
sliding window lives on-device as a ring buffer so tracking never leaves
the jitted train step; a variable number of finished episodes per step is
inserted with a cumsum-compaction scatter (out-of-window lanes dropped).

Unlike the reference (which zero-fills the deque and therefore dilutes
early means, common.py:107-110), the mean here is over min(count, len)
inserted values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Tracker:
    ring: jax.Array  # [L]
    ptr: jax.Array  # int32
    count: jax.Array  # int32 — total values ever inserted
    length: int = struct.field(pytree_node=False)

    @classmethod
    def create(cls, length: int) -> "Tracker":
        return cls(
            ring=jnp.zeros(length, jnp.float32),
            ptr=jnp.zeros((), jnp.int32),
            count=jnp.zeros((), jnp.int32),
            length=length,
        )

    def update(self, values: jax.Array, mask: jax.Array) -> "Tracker":
        """Insert values[i] where mask[i], preserving env order."""
        mask = mask.astype(jnp.int32)
        # dense slot for each masked lane: ptr, ptr+1, ... in lane order
        offsets = jnp.cumsum(mask) - 1  # [-1 .. n_new-1]
        slots = jnp.where(mask > 0, (self.ptr + offsets) % self.length, self.length)
        # out-of-bounds slot==length drops unmasked lanes
        ring = self.ring.at[slots].set(values.astype(jnp.float32), mode="drop")
        n_new = jnp.sum(mask)
        return self.replace(
            ring=ring, ptr=(self.ptr + n_new) % self.length, count=self.count + n_new
        )

    def mean(self) -> jax.Array:
        n = jnp.minimum(self.count, self.length)
        idx = jnp.arange(self.length)
        valid = (idx < n).astype(jnp.float32)
        return jnp.sum(self.ring * valid) / jnp.maximum(n.astype(jnp.float32), 1.0)


@struct.dataclass
class EpisodeStats:
    """Per-env accumulators + trackers, as maintained by the actor
    (pql/algo/pql_actor.py:24-27,129-147), plus the reference's generic
    info-key tracking (ac_base.py:54-59, 88-101: per-key Trackers with
    'last' / 'all-episode' / 'all-step' accumulation modes) and per-term
    detailed-reward trackers (ac_base.py:104-114)."""

    current_returns: jax.Array  # [E]
    current_lengths: jax.Array  # [E]
    return_tracker: Tracker
    step_tracker: Tracker
    success_tracker: Tracker
    # detailed_reward: per-term episode accumulators + trackers
    detailed_acc: dict  # name -> [E]
    detailed_tracker: dict  # name -> Tracker
    # info-key tracking: name -> (accumulator [E] for all-episode mode)
    info_acc: dict
    info_tracker: dict
    info_modes: tuple = struct.field(pytree_node=False, default=())
    info_keys: tuple = struct.field(pytree_node=False, default=())

    @classmethod
    def create(
        cls,
        num_envs: int,
        tracker_len: int = 100,
        detailed_keys: tuple = (),
        info_keys: tuple = (),
        info_modes: tuple = (),
    ) -> "EpisodeStats":
        zeros = lambda: jnp.zeros(num_envs, jnp.float32)
        return cls(
            current_returns=zeros(),
            current_lengths=zeros(),
            return_tracker=Tracker.create(tracker_len),
            step_tracker=Tracker.create(tracker_len),
            success_tracker=Tracker.create(tracker_len),
            detailed_acc={k: zeros() for k in detailed_keys},
            detailed_tracker={k: Tracker.create(tracker_len) for k in detailed_keys},
            info_acc={k: zeros() for k in info_keys},
            info_tracker={k: Tracker.create(tracker_len) for k in info_keys},
            info_modes=tuple(info_modes),
            info_keys=tuple(info_keys),
        )

    def update(self, reward: jax.Array, done: jax.Array, info: dict) -> "EpisodeStats":
        """Accumulate unscaled reward; on done, push episode stats."""
        returns = self.current_returns + reward
        lengths = self.current_lengths + 1.0
        done_mask = done > 0.5
        new = self.replace(
            current_returns=jnp.where(done_mask, 0.0, returns),
            current_lengths=jnp.where(done_mask, 0.0, lengths),
            return_tracker=self.return_tracker.update(returns, done_mask),
            step_tracker=self.step_tracker.update(lengths, done_mask),
        )
        if "success" in info:
            new = new.replace(
                success_tracker=self.success_tracker.update(
                    info["success"].astype(jnp.float32), done_mask
                )
            )
        # per-term reward logger (ac_base.py:104-114)
        if self.detailed_acc and "detailed_reward" in info:
            acc, trk = dict(new.detailed_acc), dict(new.detailed_tracker)
            for k in acc:
                total = acc[k] + info["detailed_reward"][k]
                trk[k] = trk[k].update(total, done_mask)
                acc[k] = jnp.where(done_mask, 0.0, total)
            new = new.replace(detailed_acc=acc, detailed_tracker=trk)
        # info-key trackers (ac_base.py:88-101)
        if self.info_keys:
            acc, trk = dict(new.info_acc), dict(new.info_tracker)
            for k, mode in zip(self.info_keys, self.info_modes):
                if k not in info:
                    continue
                val = info[k].astype(jnp.float32)
                if mode == "last":
                    trk[k] = trk[k].update(val, done_mask)
                elif mode == "all-episode":
                    total = acc[k] + val
                    trk[k] = trk[k].update(total, done_mask)
                    acc[k] = jnp.where(done_mask, 0.0, total)
                else:  # 'all-step': every step of every env
                    trk[k] = trk[k].update(val, jnp.ones_like(done_mask))
            new = new.replace(info_acc=acc, info_tracker=trk)
        return new

    def metrics(self) -> dict[str, jax.Array]:
        out = {
            "train/return": self.return_tracker.mean(),
            "train/episode_length": self.step_tracker.mean(),
            "train/success_rate": self.success_tracker.mean(),
        }
        for k, t in self.detailed_tracker.items():
            out[f"train/detailed_reward/{k}"] = t.mean()
        for k, t in self.info_tracker.items():
            out[k] = t.mean()
        return out
