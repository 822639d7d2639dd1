"""Bimanual (two-agent right/left) tasks.

The reference's research tier targets bimanual dexterous manipulation on
external two-hand Isaac Gym envs (via the external ``bidex`` package,
reference pql/algo/ippo.py:13). Those envs expose:

- a joint observation whose columns split into right-hand and left-hand
  views (``cfg.task.multi.single_agent_obs_idx``, reference mappo.py:59-60),
- a joint action = [right block ∥ left block] (mappo.py:66),
- ``info['detailed_reward']`` — named reward terms split per agent
  (ippo.py:92; parse_multi_rew, reference common.py:291-305),
- a per-env ``symmetry_tracker`` marking mirrored episodes (ippo.py:81).

``BimanualReacher`` is the in-repo JAX-native task with that exact
contract: two planar 2-link arms, one per agent, each reaching its own
target plus a shared coordination bonus that couples the agents. Each
arm's observation is expressed in its *handed local frame* (x points away
from the symmetry plane), which makes the mirror symmetry an exact role
swap — the cleanest instance of the structure the equivariant agents
(reference eq.py, eqs.py, ...) exploit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pql_tpu.utils.symmetry import EquivarianceSpec, MultiAgentSpec

_ARM_OBS = 12  # cos q(2), sin q(2), qd(2), target(2), tip-target(2), other_tip(2)

# C2 symmetry for the equivariant tier: reflection of the whole system
# across the y=0 plane. It acts on each arm's LOCAL obs independently:
# q → −q (so cos even, sin odd), qd odd, every local (x, y) point →
# (x, −y), torques odd. The task dynamics/reward are exactly equivariant /
# invariant under this map (no y-asymmetry in the physics).
_ARM_OBS_SIGNS = (1, 1, -1, -1, -1, -1, 1, -1, 1, -1, 1, -1)
_ARM_ACT_SIGNS = (-1, -1)


class BimanualReacher:
    """Two planar 2-link arms; agent 0 = right, agent 1 = left.

    Joint obs [24] = [right arm block (12) ∥ left arm block (12)], all in
    per-arm local frames. Joint action [4] = [right torques (2) ∥ left
    torques (2)].

    detailed_reward terms: reach/ctrl per arm + a shared ``coordination``
    bonus active only when BOTH arms are near their targets, so each
    agent's return depends on the other's behavior.
    """

    obs_dim = 2 * _ARM_OBS
    action_dim = 4
    max_episode_length = 150

    dt = 0.02
    link1 = 0.1
    link2 = 0.11
    max_torque = 1.0
    damping = 0.99
    base_half_gap = 0.3  # arm bases at x = ±base_half_gap

    def __init__(self, symmetric: bool = False):
        # symmetric=True samples half the episodes role-swapped and reports
        # it via the symmetry tracker (bidex symmetric_envs mode)
        self.symmetric = symmetric

    # static two-agent spec consumed by SymmetryManager / multi-agent algos
    multi = MultiAgentSpec(
        single_agent_obs_idx=(((0, _ARM_OBS),), ((_ARM_OBS, 2 * _ARM_OBS),)),
        single_agent_obs_dim=(_ARM_OBS, _ARM_OBS),
        single_agent_action_dim=2,
        shared_obs_dim=2 * _ARM_OBS,
        right_reward_terms=("reach_right", "ctrl_right"),
        left_reward_terms=("reach_left", "ctrl_left"),
        shared_reward_terms=("coordination",),
        # local-frame formulation ⇒ the mirror map is a pure role swap
        mirror_obs_perm=None,
        mirror_obs_sign=None,
        mirror_act_perm=None,
        mirror_act_sign=None,
    )

    # C2 reps for the equivariant agents (reference cfg.task.symmetry)
    equivariance = EquivarianceSpec(
        obs_signs=(_ARM_OBS_SIGNS, _ARM_OBS_SIGNS),
        act_signs=_ARM_ACT_SIGNS,
    )

    def init_state(self, rng):
        k_q, k_t, k_sym = jax.random.split(rng, 3)
        # local-frame targets in an annulus reachable by the arm
        radius = jax.random.uniform(k_t, (2, 1), jnp.float32, 0.08, 0.19)
        angle = jax.random.uniform(k_t, (2, 1), jnp.float32, -jnp.pi, jnp.pi)
        target = jnp.concatenate([radius * jnp.cos(angle), radius * jnp.sin(angle)], -1)
        sym = (
            jax.random.bernoulli(k_sym).astype(jnp.float32)
            if self.symmetric
            else jnp.zeros((), jnp.float32)
        )
        return {
            "q": jax.random.uniform(k_q, (2, 2), jnp.float32, -0.1, 0.1),  # [arm, joint]
            "qd": jnp.zeros((2, 2), jnp.float32),
            "target": target,  # [arm, 2] local frames
            "sym": sym,
        }

    def get_symmetry(self, state) -> jax.Array:
        """Per-env symmetry tracker (reference ippo.py:81 reads
        env.unwrapped.symmetry_tracker)."""
        return state["sym"]

    def _tip_local(self, q):
        """Fingertip in the arm's local frame; q [..., 2]."""
        x = self.link1 * jnp.cos(q[..., 0]) + self.link2 * jnp.cos(q[..., 0] + q[..., 1])
        y = self.link1 * jnp.sin(q[..., 0]) + self.link2 * jnp.sin(q[..., 0] + q[..., 1])
        return jnp.stack([x, y], axis=-1)

    def _other_tip_in_frame(self, tips_local):
        """Each arm's view of the other arm's fingertip, in its own handed
        local frame. World: arm a at base (±g, 0) with handedness h_a=±1;
        world_x = base + h·local_x. Viewing arm b's tip from arm a:
        x_a = h_a·(world_b_x − base_a_x) = −local_b_x − 2g, y_a = local_b_y."""
        g = self.base_half_gap
        other = tips_local[::-1]  # arm 0 sees arm 1 and vice versa
        return jnp.stack([-other[..., 0] - 2.0 * g, other[..., 1]], axis=-1)

    def get_obs(self, state):
        q, qd, target = state["q"], state["qd"], state["target"]
        tips = self._tip_local(q)  # [2, 2]
        other = self._other_tip_in_frame(tips)
        per_arm = jnp.concatenate(
            [jnp.cos(q), jnp.sin(q), qd, target, tips - target, other], axis=-1
        )  # [2, 12]
        return per_arm.reshape(-1)

    def dynamics(self, state, action, rng):
        torque = self.max_torque * jnp.clip(action.reshape(2, 2), -1.0, 1.0)
        qd = state["qd"] * self.damping + self.dt * torque / 0.01
        qd = jnp.clip(qd, -10.0, 10.0)
        q = state["q"] + self.dt * qd

        tips = self._tip_local(q)
        dists = jnp.linalg.norm(tips - state["target"], axis=-1)  # [2]
        near = jnp.exp(-100.0 * jnp.square(dists))  # [2]
        ctrl = -0.1 * jnp.sum(jnp.square(torque / self.max_torque), axis=-1)  # [2]

        detailed = {
            "reach_right": -dists[0] + 0.1 * near[0],
            "reach_left": -dists[1] + 0.1 * near[1],
            "ctrl_right": ctrl[0],
            "ctrl_left": ctrl[1],
            "coordination": 0.5 * near[0] * near[1],
        }
        reward = sum(detailed.values())
        success = jnp.logical_and(dists[0] < 0.05, dists[1] < 0.05)

        next_state = {"q": q, "qd": qd, "target": state["target"], "sym": state["sym"]}
        info = {
            "success": success.astype(jnp.float32),
            "detailed_reward": detailed,
        }
        return next_state, reward, jnp.asarray(False), info


class BimanualReacherSym(BimanualReacher):
    """Symmetric-episodes variant (bidex symmetric_envs mode)."""

    def __init__(self):
        super().__init__(symmetric=True)
