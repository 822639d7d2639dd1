"""Mesh construction and sharding-spec derivation.

The reference distributes work by *process placement*: sim on GPU 0,
V-learner and P-learner as Ray actors on other GPUs, tensors shipped with
``.to(device)`` (reference scripts/train_pql.py:41-51,
pql/algo/pql_actor.py:122-126). The TPU-native equivalent is a single SPMD
program over a 1-D device mesh whose axis shards the **environment axis**
(and with it the replay buffer and every per-env carry); parameters are
replicated and gradients are pmean'd over the axis. Weight "shipping"
disappears — every shard always has the current parameters in local HBM.

Sharding specs for a whole train-state pytree are derived by rule: leaves
reached under field names listed in ``env_axis_fields`` get the env axis at
their known leading position; everything else is replicated.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int | None = None, axis_name: str = "env") -> Mesh:
    """1-D mesh over the first num_devices devices (default: all)."""
    devices = jax.devices()
    n = num_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"Requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def _spec_for_leaf(path: tuple, leaf, env_axis_fields: dict[str, int], axis_name: str):
    """Pick a PartitionSpec from the first path element that names a
    field with an env axis; axis position comes from the field rule."""
    for entry in path:
        name = getattr(entry, "name", None) or getattr(entry, "key", None)
        if name in env_axis_fields:
            pos = env_axis_fields[name]
            if hasattr(leaf, "ndim") and leaf.ndim > pos:
                spec = [None] * leaf.ndim
                spec[pos] = axis_name
                return P(*spec)
            return P()
    return P()


def state_pspecs(state: Any, env_axis_fields: dict[str, int], axis_name: str = "env"):
    """PartitionSpec pytree matching `state`.

    env_axis_fields maps a state field name → which array axis carries the
    env dimension for every leaf under it (e.g. {'obs': 0, 'replay': 1}).
    """
    paths_leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    specs = [_spec_for_leaf(path, leaf, env_axis_fields, axis_name) for path, leaf in paths_leaves]
    treedef = jax.tree_util.tree_structure(state)
    return jax.tree_util.tree_unflatten(treedef, specs)


def state_shardings(mesh: Mesh, state: Any, env_axis_fields: dict[str, int]):
    """NamedSharding pytree for jit in/out_shardings."""
    axis_name = mesh.axis_names[0]
    specs = state_pspecs(state, env_axis_fields, axis_name)
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )
