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
    to get proper types/shardings back (restore args are constructed from
    the target so sharded train states come back with their mesh layout)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if target is None:
        return ckptr.restore(path)
    restore_args = ocp.checkpoint_utils.construct_restore_args(target)
    return ckptr.restore(
        path, args=ocp.args.PyTreeRestore(item=target, restore_args=restore_args)
    )


def maybe_resume_full_state(cfg, state):
    """Preemption recovery: if ``cfg.checkpoint_dir/state`` holds a full
    train-state checkpoint (written by the periodic save in
    scripts/train.py), restore it into the freshly-built state and return
    (state, True). The freshly-built state supplies shapes/dtypes/
    shardings; every leaf — params, optimizer moments, rms, replay ring,
    env state, rng, counters — is overwritten from disk, so training
    continues bitwise-identically to an uninterrupted run. This is the
    recovery path the reference lacks (its checkpoints are weights-only
    wandb artifacts, model_util.py:24-41)."""
    if not cfg.checkpoint_dir:
        return state, False
    path = os.path.join(cfg.checkpoint_dir, "state")
    if not os.path.exists(path):
        return state, False
    return load_checkpoint(path, target=state), True


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


def load_model_snapshot(path: str):
    """Load a weights-only snapshot saved by save_model_snapshot
    (the analog of the reference's wandb-artifact download + torch.load,
    model_util.py:9-21). Returns {actor, critic, obs_rms-dict}.

    ``wandb-artifact://entity/project/name:tag`` resolves through the
    wandb Artifact API first (reference load_model, model_util.py:9-21)
    and then loads the downloaded directory."""
    prefix = "wandb-artifact://"
    if path.startswith(prefix):
        try:
            import wandb  # noqa: PLC0415
        except ImportError as e:  # pragma: no cover - wandb not in image
            raise ImportError(
                f"artifact={path} needs the wandb package; pass a local "
                "checkpoint directory instead"
            ) from e
        path = wandb.Api().artifact(path[len(prefix) :]).download()
    return load_checkpoint(path)


def restore_into_state(state, snapshot):
    """Weights-only resume (reference load_model wiring: actor into the
    agent, critic into the learners, rms into the actor —
    train_baselines.py:33-37, pql_v_learner.py:44-45, pql_actor.py:37-38).

    Handles both single-agent states (actor_params/critic_params fields)
    and multi-agent states (one ``params`` dict)."""
    import jax.numpy as jnp

    rms = snapshot.get("obs_rms")
    if rms is not None and hasattr(state, "obs_rms"):
        state = state.replace(
            obs_rms=state.obs_rms.replace(
                mean=jnp.asarray(rms["mean"]),
                var=jnp.asarray(rms["var"]),
                count=jnp.asarray(rms["count"]),
            )
        )
    if hasattr(state, "params"):
        params = dict(state.params)
        actor = snapshot.get("actor")
        critic = snapshot.get("critic")
        if isinstance(actor, dict) and set(actor) & set(params):
            params.update(actor)
        if isinstance(critic, dict) and set(critic) & set(params):
            params.update(critic)
        return state.replace(params=params)
    updates = {}
    if "actor" in snapshot:
        updates["actor_params"] = snapshot["actor"]
        if hasattr(state, "actor_target"):
            updates["actor_target"] = snapshot["actor"]
    if "critic" in snapshot:
        updates["critic_params"] = snapshot["critic"]
        if hasattr(state, "critic_target"):
            updates["critic_target"] = snapshot["critic"]
    return state.replace(**updates)
