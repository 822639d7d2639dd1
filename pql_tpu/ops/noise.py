"""Exploration noise injection (reference pql/utils/noise.py:19-41).

PQL's "mixed exploration" assigns each parallel env its own Gaussian std,
linearly spaced over [std_min, std_max] across the env axis
(noise.py:30-41). On a sharded env axis the std for a local env is computed
from its *global* index so the mixture is identical to the unsharded case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def add_normal_noise(
    rng: jax.Array,
    x: jax.Array,
    std: float | jax.Array,
    noise_bounds: tuple[float, float] | None = None,
    out_bounds: tuple[float, float] | None = None,
) -> jax.Array:
    """x + clip(N(0, std)) with optional clamping (noise.py:19-27)."""
    noise = jax.random.normal(rng, x.shape, x.dtype) * std
    if noise_bounds is not None:
        noise = jnp.clip(noise, noise_bounds[0], noise_bounds[1])
    out = x + noise
    if out_bounds is not None:
        out = jnp.clip(out, out_bounds[0], out_bounds[1])
    return out


def mixed_noise_std(
    num_envs_global: int,
    std_min: float,
    std_max: float,
    global_start: int | jax.Array = 0,
    num_local: int | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Per-env std ladder: linspace(std_min, std_max, E_global)[start:start+local].

    Matches torch.linspace semantics (noise.py:31-32): ascending from
    std_min to std_max inclusive.
    """
    num_local = num_local if num_local is not None else num_envs_global
    if num_envs_global == 1:
        return jnp.full((1,), std_min, dtype)
    step = (std_max - std_min) / (num_envs_global - 1)
    local_idx = jnp.arange(num_local, dtype=dtype) + jnp.asarray(global_start, dtype)
    return std_min + step * local_idx


def add_mixed_normal_noise(
    rng: jax.Array,
    x: jax.Array,  # [E_local, act_dim]
    std_min: float,
    std_max: float,
    noise_bounds: tuple[float, float] | None = None,
    out_bounds: tuple[float, float] | None = None,
    num_envs_global: int | None = None,
    global_start: int | jax.Array = 0,
) -> jax.Array:
    """Per-env mixed-std noise (noise.py:30-41), shard-aware."""
    e_local = x.shape[0]
    e_global = num_envs_global if num_envs_global is not None else e_local
    std = mixed_noise_std(e_global, std_min, std_max, global_start, e_local, x.dtype)
    noise = jax.random.normal(rng, x.shape, x.dtype) * std[:, None]
    if noise_bounds is not None:
        noise = jnp.clip(noise, noise_bounds[0], noise_bounds[1])
    out = x + noise
    if out_bounds is not None:
        out = jnp.clip(out, out_bounds[0], out_bounds[1])
    return out
