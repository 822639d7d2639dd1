"""Noise-decay schedules (reference pql/utils/schedule_util.py:4-46).

Functional: a schedule is a static spec evaluated at an integer step, so it
traces cleanly inside jit (no Python-side mutable counters).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class LinearSchedule:
    start_val: float
    end_val: float
    total_iters: int

    def __call__(self, step: jax.Array | int) -> jax.Array:
        frac = jnp.clip(jnp.asarray(step, jnp.float32) / self.total_iters, 0.0, 1.0)
        return self.start_val + (self.end_val - self.start_val) * frac


@dataclass(frozen=True)
class ExponentialSchedule:
    start_val: float
    gamma: float
    end_val: float

    def __call__(self, step: jax.Array | int) -> jax.Array:
        val = self.start_val * jnp.power(self.gamma, jnp.asarray(step, jnp.float32))
        # exp schedule decays toward (but not past) end_val
        if self.end_val <= self.start_val:
            return jnp.maximum(val, self.end_val)
        return jnp.minimum(val, self.end_val)


def schedule_value(noise_cfg, step: jax.Array | int) -> jax.Array:
    """Resolve the current exploration std from a NoiseConfig.

    Mirrors PQLActor.get_noise_std (reference pql/algo/pql_actor.py:59-69):
    no decay → std_max.
    """
    if noise_cfg.decay == "linear":
        sched = LinearSchedule(noise_cfg.std_max, noise_cfg.std_min, noise_cfg.lin_decay_iters)
        return sched(step)
    if noise_cfg.decay == "exp":
        sched = ExponentialSchedule(noise_cfg.std_max, noise_cfg.exp_decay_rate, noise_cfg.std_min)
        return sched(step)
    return jnp.asarray(noise_cfg.std_max, jnp.float32)
