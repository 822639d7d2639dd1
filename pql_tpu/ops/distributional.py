"""C51-style categorical distributional ops (PQL-D).

The reference projects the target distribution onto the fixed support with
a scatter (``index_add_``) kernel (reference pql/utils/distl_util.py:4-20).
Scatters map poorly onto the TPU vector units, so we use the algebraically
identical *dense hat-kernel* formulation:

    proj[b, j] = sum_i p[b, i] * max(0, 1 - |pos[b, i] - j|)

where ``pos = (clip(r + (1-d)·γ·z_i, v_min, v_max) - v_min) / Δz``. For a
non-integer pos this splits mass (1-frac)/(frac) between the two neighbor
atoms; for an integer pos it puts all mass on that atom — exactly matching
the reference's floor/ceil split including its l==u edge adjustments
(distl_util.py:12-14). The contraction is a [B,A]x[B,A,A] batched matmul
that rides the MXU; mass conservation is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def support_atoms(v_min: float, v_max: float, num_atoms: int, dtype=jnp.float32) -> jax.Array:
    """The fixed categorical support z (reference pql/models/mlp.py:253)."""
    return jnp.linspace(v_min, v_max, num_atoms, dtype=dtype)


def categorical_projection(
    next_dist: jax.Array,  # [B, A] probabilities of the bootstrap distribution
    reward: jax.Array,  # [B] or [B, 1]
    done: jax.Array,  # [B] or [B, 1]
    gamma: float,
    v_min: float = -10.0,
    v_max: float = 10.0,
) -> jax.Array:
    """Project r + (1-d)·γ·Z onto the fixed support (distl_util.py:4-20)."""
    num_atoms = next_dist.shape[-1]
    delta_z = (v_max - v_min) / (num_atoms - 1)
    z = support_atoms(v_min, v_max, num_atoms, next_dist.dtype)

    reward = reward.reshape(reward.shape[0], -1)  # [B, 1]
    done = done.reshape(done.shape[0], -1).astype(next_dist.dtype)

    target_z = jnp.clip(reward + (1.0 - done) * gamma * z[None, :], v_min, v_max)
    pos = (target_z - v_min) / delta_z  # [B, A], in [0, A-1]

    atom_idx = jnp.arange(num_atoms, dtype=next_dist.dtype)  # [A]
    # hat kernel weights [B, A_src, A_dst]
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, :, None] - atom_idx[None, None, :]))
    return jnp.einsum("bi,bij->bj", next_dist, w)


def categorical_td_target(
    next_dist1: jax.Array,
    next_dist2: jax.Array,
    reward: jax.Array,
    done: jax.Array,
    gamma_n: float,
    v_min: float,
    v_max: float,
) -> jax.Array:
    """PQL-D target: elementwise min of the two projected twin distributions
    (reference pql/algo/pql_v_learner.py:83-102)."""
    p1 = categorical_projection(next_dist1, reward, done, gamma_n, v_min, v_max)
    p2 = categorical_projection(next_dist2, reward, done, gamma_n, v_min, v_max)
    return jnp.minimum(p1, p2)


def dist_to_q(dist: jax.Array, v_min: float, v_max: float) -> jax.Array:
    """Expected value of a categorical distribution over the support
    (reference pql/models/mlp.py:256-259)."""
    z = support_atoms(v_min, v_max, dist.shape[-1], dist.dtype)
    return jnp.sum(dist * z, axis=-1)


def binary_cross_entropy(pred: jax.Array, target: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Elementwise-mean BCE matching torch F.binary_cross_entropy on
    probabilities (used as the PQL-D critic loss, pql_v_learner.py:40,108)."""
    pred = jnp.clip(pred, eps, 1.0 - eps)
    return -jnp.mean(target * jnp.log(pred) + (1.0 - target) * jnp.log1p(-pred))
