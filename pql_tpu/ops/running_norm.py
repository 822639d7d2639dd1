"""Running mean/std observation normalizer as an immutable pytree.

Reproduces the parallel-Welford moment merge of the reference
``RunningMeanStd`` (reference pql/utils/torch_util.py:68-114) in functional
form, plus a cross-shard variant that merges moments over a mesh axis so a
sharded env batch produces exactly the same statistics as the unsharded one.

The reference has two normalize entry points with different clamping:
- ``RunningMeanStd.normalize`` (torch_util.py:83-85): no clamp — used by the
  actor when picking actions.
- tuple-form ``normalize`` (pql/utils/common.py:139-145): clamps to ±5 —
  used by the V-/P-learners on sampled batches.
Both are provided here (``normalize`` and ``normalize_clip``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningMeanStd:
    mean: jax.Array  # [obs_dim]
    var: jax.Array  # [obs_dim]
    count: jax.Array  # scalar

    epsilon: float = struct.field(pytree_node=False, default=1e-4)

    @classmethod
    def create(cls, shape, epsilon: float = 1e-4, dtype=jnp.float32) -> "RunningMeanStd":
        # count starts at epsilon like the reference (torch_util.py:75)
        return cls(
            mean=jnp.zeros(shape, dtype),
            var=jnp.ones(shape, dtype),
            count=jnp.asarray(epsilon, dtype),
            epsilon=epsilon,
        )

    def update(self, x: jax.Array) -> "RunningMeanStd":
        """Merge a batch (leading axis = batch) into the running moments."""
        batch_mean = jnp.mean(x, axis=0)
        # torch .var() uses the unbiased (ddof=1) estimator — match it.
        batch_var = jnp.var(x, axis=0, ddof=1)
        batch_count = jnp.asarray(x.shape[0], self.count.dtype)
        return self._merge(batch_mean, batch_var, batch_count)

    def update_sharded(self, x: jax.Array, axis_name: str) -> "RunningMeanStd":
        """Like update(), but x is one shard of a batch sharded on axis_name.

        Computes global batch moments with psums so every shard ends with
        the same (replicated) statistics as a single-device update on the
        gathered batch.
        """
        n_local = x.shape[0]
        n_total = jax.lax.psum(jnp.asarray(n_local, jnp.float32), axis_name)
        gmean = jax.lax.psum(jnp.sum(x, axis=0), axis_name) / n_total
        gsumsq = jax.lax.psum(jnp.sum((x - gmean) ** 2, axis=0), axis_name)
        gvar = gsumsq / jnp.maximum(n_total - 1.0, 1.0)  # unbiased, like torch
        return self._merge(gmean, gvar, n_total.astype(self.count.dtype))

    def _merge(self, batch_mean, batch_var, batch_count) -> "RunningMeanStd":
        # Chan et al. parallel merge (torch_util.py:91-103)
        delta = batch_mean - self.mean
        tot = self.count + batch_count
        new_mean = self.mean + delta * batch_count / tot
        m_a = self.var * self.count
        m_b = batch_var * batch_count
        m2 = m_a + m_b + jnp.square(delta) * self.count * batch_count / tot
        return self.replace(mean=new_mean, var=m2 / tot, count=tot)

    def normalize(self, x: jax.Array) -> jax.Array:
        return (x - self.mean) / jnp.sqrt(self.var + self.epsilon)

    def unnormalize(self, x: jax.Array) -> jax.Array:
        return x * jnp.sqrt(self.var + self.epsilon) + self.mean

    def normalize_clip(self, x: jax.Array, clip: float = 5.0) -> jax.Array:
        return jnp.clip(self.normalize(x), -clip, clip)


def normalize_clip(x: jax.Array, rms: RunningMeanStd | None, clip: float = 5.0) -> jax.Array:
    """Tuple-form learner normalization (reference common.py:139-145)."""
    if rms is None:
        return x
    return rms.normalize_clip(x, clip)
