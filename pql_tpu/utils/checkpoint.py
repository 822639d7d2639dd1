"""Checkpoint save/load (orbax-backed).

The reference persists weights-only {actor, critic, obs_rms} as wandb
artifacts saved by the evaluator on new-best eval return (reference
pql/utils/evaluator.py:112-119, pql/utils/model_util.py:9-41). Here
checkpoints are full-fidelity local orbax snapshots: any pytree —
including the entire train state (params, optimizer moments, rms, replay,
counters, rng) — so training is resumable exactly, not weights-only.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save_checkpoint(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)


def load_checkpoint(path: str, target: Any | None = None) -> Any:
    """Restore a checkpoint; pass `target` (a matching pytree of arrays)
    to get proper types/shardings back."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if target is None:
        return ckptr.restore(path)
    return ckptr.restore(path, args=ocp.args.PyTreeRestore(item=target))


def save_model_snapshot(path: str, actor_params, critic_params, obs_rms) -> None:
    """Weights-only snapshot matching the reference save_model payload
    (model_util.py:24-41: {actor, critic, obs_rms})."""
    save_checkpoint(
        path,
        {
            "actor": jax.device_get(actor_params),
            "critic": jax.device_get(critic_params),
            "obs_rms": jax.device_get(
                {"mean": obs_rms.mean, "var": obs_rms.var, "count": obs_rms.count}
            ),
        },
    )
