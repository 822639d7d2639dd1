"""Exploration noise injection (reference pql/utils/noise.py:19-41).

PQL's "mixed exploration" assigns each parallel env its own Gaussian std,
linearly spaced over [std_min, std_max] across the env axis
(noise.py:30-41). On a sharded env axis the std for a local env is computed
from its *global* index so the mixture is identical to the unsharded case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def per_row_normal(rng: jax.Array, shape, dtype, global_start) -> jax.Array:
    """[N, ...] standard-normal draw where row i's bits come from
    fold_in(rng, global_start + i): the draw for a given env depends only
    on its GLOBAL index, so sharding the env axis over any mesh produces
    bitwise-identical noise (mesh-invariant sim streams, SURVEY §4)."""
    idx = jnp.arange(shape[0]) + jnp.asarray(global_start, jnp.int32)
    keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(idx)
    return jax.vmap(lambda k: jax.random.normal(k, shape[1:], dtype))(keys)


def per_row_uniform(rng: jax.Array, shape, dtype, lo, hi, global_start=0) -> jax.Array:
    """Mesh-invariant per-row uniform draw (see per_row_normal)."""
    idx = jnp.arange(shape[0]) + jnp.asarray(global_start, jnp.int32)
    keys = jax.vmap(lambda i: jax.random.fold_in(rng, i))(idx)
    return jax.vmap(lambda k: jax.random.uniform(k, shape[1:], dtype, lo, hi))(keys)


def add_normal_noise(
    rng: jax.Array,
    x: jax.Array,
    std: float | jax.Array,
    noise_bounds: tuple[float, float] | None = None,
    out_bounds: tuple[float, float] | None = None,
    global_start: int | jax.Array | None = None,
) -> jax.Array:
    """x + clip(N(0, std)) with optional clamping (noise.py:19-27).

    Pass ``global_start`` (the shard's first global env index) when x rows
    are envs of a sharded axis — noise then derives per-row from global
    indices and is identical for any mesh layout. Leave None for
    non-env-indexed rows (e.g. target-policy smoothing on replay batches).
    """
    if global_start is None:
        noise = jax.random.normal(rng, x.shape, x.dtype) * std
    else:
        noise = per_row_normal(rng, x.shape, x.dtype, global_start) * std
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
    """Per-env mixed-std noise (noise.py:30-41), shard-aware: both the std
    ladder and the noise bits derive from global env indices, so the
    result is bitwise mesh-invariant."""
    e_local = x.shape[0]
    e_global = num_envs_global if num_envs_global is not None else e_local
    std = mixed_noise_std(e_global, std_min, std_max, global_start, e_local, x.dtype)
    noise = per_row_normal(rng, x.shape, x.dtype, global_start) * std[:, None]
    if noise_bounds is not None:
        noise = jnp.clip(noise, noise_bounds[0], noise_bounds[1])
    out = x + noise
    if out_bounds is not None:
        out = jnp.clip(out, out_bounds[0], out_bounds[1])
    return out
