"""Two-agent observation/action/reward routing with mirror symmetry.

The reference's bimanual agents (reference pql/algo/ippo.py, iddpg.py,
eq*.py, ppoteam*.py) delegate obs splitting, action merging, and reward
parsing to an *external* package: ``bidex.utils.symmetry.SymmetryManager``
(imported at reference pql/algo/ippo.py:13 — the package is not in the
repo). The call surface the agents rely on is:

- ``get_multi_agent_obs(obs, symmetry_tracker) -> (obs_right, obs_left)``
  (ippo.py:82) — slice the joint observation into per-hand views; in
  "symmetric envs" mode, mirrored episodes have their roles swapped and
  coordinates reflected into the canonical (right-hand) frame,
- ``get_execute_action(act_right, act_left, symmetry_tracker) -> action``
  (ippo.py:89) — inverse map: assemble the joint sim action,
- ``get_multi_agent_rew(detailed_reward, symmetry_tracker) ->
  (rew_right, rew_left)`` (ippo.py:92) — split named reward terms per
  agent (the in-repo analog is parse_multi_rew, reference
  pql/utils/common.py:291-305).

This module is the in-repo, JAX-native replacement. Column slicing is a
static gather (reference pql/utils/torch_util.py:117-125 slice_tensor);
mirroring is a signed permutation (a linear involution), so every op is a
fixed-shape gather/where that fuses into the rollout under jit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


def ranges_to_indices(ranges) -> np.ndarray:
    """[(start, end), ...] column ranges -> flat index vector
    (reference slice_tensor, pql/utils/torch_util.py:117-125)."""
    idx: list[int] = []
    for start, end in ranges:
        idx.extend(range(int(start), int(end)))
    return np.asarray(idx, dtype=np.int32)


def slice_tensor(x: jax.Array, ranges) -> jax.Array:
    """Gather the given column ranges from the last axis."""
    return jnp.take(x, jnp.asarray(ranges_to_indices(ranges)), axis=-1)


@dataclass(frozen=True)
class MultiAgentSpec:
    """Static description of a two-agent (right/left) task.

    Mirrors the reference's ``cfg.task.multi`` block consumed by the
    bimanual agents (reference ippo.py:19-21, mappo.py:24, iddpg.py:24-27):

    - single_agent_obs_idx: per-agent column ranges into the joint obs,
    - single_agent_obs_dim / single_agent_action_dim / shared_obs_dim,
    - reward_terms: names in info['detailed_reward'] assigned to (right,
      left, shared) — shared terms count for both (parse_multi_rew,
      reference common.py:291-305),
    - mirror_*: signed permutations defining the reflection that maps the
      left frame onto the right frame (replaces escnn group reps for the
      C2 mirror case the bimanual tasks use).
    """

    single_agent_obs_idx: tuple  # ((ranges right), (ranges left))
    single_agent_obs_dim: tuple  # (dim_right, dim_left)
    single_agent_action_dim: int
    shared_obs_dim: int
    right_reward_terms: tuple = ()
    left_reward_terms: tuple = ()
    shared_reward_terms: tuple = ()
    # signed permutations (None = identity): applied to a per-agent view to
    # reflect it across the symmetry plane
    mirror_obs_perm: tuple | None = None
    mirror_obs_sign: tuple | None = None
    mirror_act_perm: tuple | None = None
    mirror_act_sign: tuple | None = None


@dataclass(frozen=True)
class EquivarianceSpec:
    """Static C2-representation data for equivariant networks.

    Mirrors the reference's ``cfg.task.symmetry`` field lists consumed by
    the equivariant agents (reference eq.py:26-29, eqs.py:27-31: per-hand
    actor_input_fields/actor_output_fields naming escnn representations).
    Here a representation is its generator: per-dimension signs plus an
    optional permutation (signed permutation = every irrep combination a
    C2 field type can express).
    """

    obs_signs: tuple  # ((right-hand signs...), (left-hand signs...))
    act_signs: tuple  # per-hand action signs
    obs_perms: tuple | None = None  # optional ((right perm...), (left perm...))
    act_perm: tuple | None = None


def _signed_perm(x: jax.Array, perm, sign) -> jax.Array:
    if perm is not None:
        x = jnp.take(x, jnp.asarray(np.asarray(perm, np.int32)), axis=-1)
    if sign is not None:
        x = x * jnp.asarray(np.asarray(sign, np.float32))
    return x


class SymmetryManager:
    """Routes joint obs/actions/rewards between the sim and the two agents.

    ``symmetry_tracker`` is a per-env {0,1} vector: 1 marks an episode
    whose initial condition was sampled mirrored. For those envs the
    right-agent view is taken from the *left* columns reflected into the
    right frame (and vice versa), so each policy always sees its canonical
    frame — the mechanism the equivariant agents exploit (reference
    eq.py:75-87 feeds symmetric frames from the same manager).
    """

    def __init__(self, spec: MultiAgentSpec, symmetric_envs: bool = False):
        self.spec = spec
        self.symmetric_envs = symmetric_envs
        self._idx_right = jnp.asarray(ranges_to_indices(spec.single_agent_obs_idx[0]))
        self._idx_left = jnp.asarray(ranges_to_indices(spec.single_agent_obs_idx[1]))
        if len(self._idx_right) != len(self._idx_left) and symmetric_envs:
            raise ValueError("symmetric envs require equal per-agent obs dims")

    # ------------------------------------------------------------- obs

    def get_multi_agent_obs(self, obs: jax.Array, tracker: jax.Array | None):
        """Joint obs [E, D] -> (obs_right [E, d0], obs_left [E, d1])."""
        ob_r = jnp.take(obs, self._idx_right, axis=-1)
        ob_l = jnp.take(obs, self._idx_left, axis=-1)
        if not self.symmetric_envs or tracker is None:
            return ob_r, ob_l
        s = self.spec
        m = (tracker > 0.5).reshape((-1,) + (1,) * (ob_r.ndim - 1))
        # mirrored env: swap roles, reflect each view into canonical frame
        ob_r_mirror = _signed_perm(ob_l, s.mirror_obs_perm, s.mirror_obs_sign)
        ob_l_mirror = _signed_perm(ob_r, s.mirror_obs_perm, s.mirror_obs_sign)
        return jnp.where(m, ob_r_mirror, ob_r), jnp.where(m, ob_l_mirror, ob_l)

    # ---------------------------------------------------------- action

    def get_execute_action(
        self, act_right: jax.Array, act_left: jax.Array, tracker: jax.Array | None
    ) -> jax.Array:
        """Assemble the joint sim action [E, 2*a]: right block then left
        block (the layout the bimanual envs expect; reference
        mappo.py:66 concatenates right then left)."""
        if self.symmetric_envs and tracker is not None:
            s = self.spec
            m = (tracker > 0.5).reshape((-1,) + (1,) * (act_right.ndim - 1))
            # inverse of the obs map: un-reflect and swap back
            unmirror_r = _signed_perm(act_left, s.mirror_act_perm, s.mirror_act_sign)
            unmirror_l = _signed_perm(act_right, s.mirror_act_perm, s.mirror_act_sign)
            act_right = jnp.where(m, unmirror_r, act_right)
            act_left = jnp.where(m, unmirror_l, act_left)
        return jnp.concatenate([act_right, act_left], axis=-1)

    # ---------------------------------------------------------- reward

    def get_multi_agent_rew(self, detailed_reward: dict, tracker: jax.Array | None):
        """Per-agent reward from named terms (parse_multi_rew semantics,
        reference common.py:291-305): own terms + shared terms."""
        s = self.spec

        def total(terms):
            parts = [detailed_reward[t] for t in terms] + [
                detailed_reward[t] for t in s.shared_reward_terms
            ]
            if not parts:
                return jnp.zeros_like(next(iter(detailed_reward.values())))
            return sum(parts[1:], parts[0])

        rew_r = total(s.right_reward_terms)
        rew_l = total(s.left_reward_terms)
        if self.symmetric_envs and tracker is not None:
            m = tracker > 0.5
            rew_r, rew_l = jnp.where(m, rew_l, rew_r), jnp.where(m, rew_r, rew_l)
        return rew_r, rew_l


def parse_multi_rew(detailed_reward: dict, spec: MultiAgentSpec):
    """Standalone named-term reward split (reference common.py:291-305)."""
    return SymmetryManager(spec).get_multi_agent_rew(detailed_reward, None)
