"""Polyak averaging of target-network parameters.

Reference ``soft_update`` iterates module parameters in-place
(pql/utils/torch_util.py:9-12); here it is a single fused tree_map that XLA
compiles into one elementwise kernel per leaf.
"""

from __future__ import annotations

import jax


def soft_update(target_params, online_params, tau: float):
    """target ← tau·online + (1-tau)·target."""
    return jax.tree_util.tree_map(
        lambda t, o: t * (1.0 - tau) + o * tau, target_params, online_params
    )
