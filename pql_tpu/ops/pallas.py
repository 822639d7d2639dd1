"""Pallas TPU kernels for the hot distributional ops.

The C51 categorical projection is the one op in the PQL-D critic path
whose XLA lowering is memory-wasteful: the dense hat-kernel formulation
(pql_tpu.ops.distributional.categorical_projection) materializes a
[B, A, A] weight tensor in HBM (8192×51×51 fp32 ≈ 85 MB **per projection,
twice per critic update**). This kernel streams batch tiles through VMEM
and accumulates the projection with an unrolled loop over the A source
atoms — the [B, A, A] intermediate never exists.

Semantics are identical to the reference scatter projection
(reference pql/utils/distl_util.py:4-20) and to the dense formulation
(property-tested against it): this is a target-side op and is always used
under stop_gradient (pql/algo/pql_v_learner.py:83-102), so the kernel is
forward-only.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _projection_kernel(p_ref, rew_ref, done_ref, out_ref, *, gamma, v_min, v_max):
    num_atoms = p_ref.shape[-1]
    delta_z = (v_max - v_min) / (num_atoms - 1)
    # TPU iota must be integer-typed; cast after (guide: Iota section)
    atom_f = jax.lax.broadcasted_iota(jnp.int32, (1, num_atoms), 1).astype(jnp.float32)
    z = atom_f * delta_z + v_min

    p = p_ref[:]  # [T, A]
    rew = rew_ref[:]  # [T, 1]
    done = done_ref[:]  # [T, 1]
    target_z = jnp.clip(rew + (1.0 - done) * gamma * z, v_min, v_max)
    pos = (target_z - v_min) / delta_z  # [T, A]

    j = atom_f  # dst atom indices [1, A]
    acc = jnp.zeros_like(p)
    # unrolled sweep over source atoms: each contributes a hat of width 1
    for i in range(num_atoms):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, i : i + 1] - j))  # [T, A]
        acc = acc + p[:, i : i + 1] * w
    out_ref[:] = acc


def categorical_projection_pallas(
    next_dist: jax.Array,  # [B, A]
    reward: jax.Array,  # [B] or [B, 1]
    done: jax.Array,  # [B] or [B, 1]
    gamma: float,
    v_min: float = -10.0,
    v_max: float = 10.0,
    tile: int = 256,
    interpret: bool | None = None,
) -> jax.Array:
    """Tiled VMEM-resident C51 projection (forward-only; see module doc).

    ``interpret`` defaults to True off-TPU so CPU tests exercise the same
    kernel through the Pallas interpreter.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, a = next_dist.shape
    reward = reward.reshape(b, 1).astype(jnp.float32)
    done = done.reshape(b, 1).astype(jnp.float32)
    next_dist = next_dist.astype(jnp.float32)

    pad = (-b) % tile
    if pad:
        next_dist = jnp.pad(next_dist, ((0, pad), (0, 0)))
        reward = jnp.pad(reward, ((0, pad), (0, 0)))
        done = jnp.pad(done, ((0, pad), (0, 0)))
    bp = b + pad

    out = pl.pallas_call(
        partial(_projection_kernel, gamma=gamma, v_min=v_min, v_max=v_max),
        out_shape=jax.ShapeDtypeStruct((bp, a), jnp.float32),
        grid=(bp // tile,),
        in_specs=[
            pl.BlockSpec((tile, a), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, a), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(next_dist, reward, done)
    return out[:b]


def categorical_td_target_pallas(
    next_dist1, next_dist2, reward, done, gamma_n, v_min, v_max
):
    """PQL-D target via the Pallas projection (min of twin projections,
    reference pql_v_learner.py:83-102)."""
    p1 = categorical_projection_pallas(next_dist1, reward, done, gamma_n, v_min, v_max)
    p2 = categorical_projection_pallas(next_dist2, reward, done, gamma_n, v_min, v_max)
    return jnp.minimum(p1, p2)
