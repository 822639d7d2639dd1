"""Rigid-body locomotion tasks on the in-repo physics engine.

Ant is the workhorse benchmark of the reference (IsaacGymEnvs 'Ant' at
4096 envs, reference pql/utils/common.py:246-250, BASELINE.md). This is a
JAX-native quadruped of the same structure — free-base torso, 4 legs ×
(hip yaw hinge + knee pitch hinge), 8 actuators, penalty ground contact —
with IGE-style observation/reward shaping (forward progress + alive bonus
− control cost, terminate on fall). Exact obs layout differs from IGE
(which exposes PhysX-specific force sensors); capability and scale parity
is the goal, not bit parity.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pql_tpu.physics import FREE, Geom, HINGE, RigidBodyModel
from pql_tpu.physics.contact import ground_contacts
from pql_tpu.physics.dynamics import body_velocities, fd_step, fwd_kinematics
from pql_tpu.physics.spatial import quat_rotate


def ant_model(dt: float = 1.0 / 240.0) -> RigidBodyModel:
    """Quadruped: torso (free) + 4 × (thigh, shin). 9 bodies, nv = 14."""
    leg_angles = [np.pi / 4, 3 * np.pi / 4, 5 * np.pi / 4, 7 * np.pi / 4]
    torso_r = 0.25
    thigh_len, shin_len = 0.2, 0.4
    m_torso, m_thigh, m_shin = 10.0, 1.5, 1.0

    parent = [-1]
    joint_type = [FREE]
    joint_axis = [np.zeros(3)]
    tree_pos = [np.zeros(3)]
    mass = [m_torso]
    com = [np.zeros(3)]
    inertia = [0.4 * m_torso * torso_r**2 * np.eye(3)]
    geoms = [Geom(0, (0.0, 0.0, 0.0), torso_r)]

    def rod_inertia(m, length, axis_dir):
        """Thin-rod inertia about the joint end, axis along axis_dir."""
        i_perp = m * length**2 / 3.0
        eye = np.eye(3)
        d = axis_dir / np.linalg.norm(axis_dir)
        return i_perp * (eye - np.outer(d, d)) + 1e-4 * eye

    for k, phi in enumerate(leg_angles):
        d = np.array([np.cos(phi), np.sin(phi), 0.0])
        t = np.array([-np.sin(phi), np.cos(phi), 0.0])  # knee axis (tangent)
        thigh, shin = 1 + 2 * k, 2 + 2 * k
        # thigh: hip yaw hinge about z at the torso rim
        parent.append(0)
        joint_type.append(HINGE)
        joint_axis.append(np.array([0.0, 0.0, 1.0]))
        tree_pos.append(torso_r * d)
        mass.append(m_thigh)
        com.append(0.5 * thigh_len * d)
        inertia.append(rod_inertia(m_thigh, thigh_len, d))
        # shin: knee pitch hinge about the tangent; +angle bends the foot down
        parent.append(thigh)
        joint_type.append(HINGE)
        joint_axis.append(t)
        tree_pos.append(thigh_len * d)
        mass.append(m_shin)
        com.append(0.5 * shin_len * d)
        inertia.append(rod_inertia(m_shin, shin_len, d))
        geoms.append(Geom(shin, tuple(shin_len * d), 0.08))  # foot

    nv = 6 + 8
    limit_lo = np.full(nv, -np.inf, np.float32)
    limit_hi = np.full(nv, np.inf, np.float32)
    for k in range(4):
        hip_dof, knee_dof = 6 + 2 * k, 7 + 2 * k
        limit_lo[hip_dof], limit_hi[hip_dof] = -0.7, 0.7
        limit_lo[knee_dof], limit_hi[knee_dof] = 0.35, 1.6

    damping = np.zeros(nv, np.float32)
    damping[6:] = 1.0
    armature = np.zeros(nv, np.float32)
    armature[6:] = 0.05

    return RigidBodyModel(
        nb=9,
        parent=tuple(parent),
        joint_type=tuple(joint_type),
        joint_axis=np.asarray(joint_axis, np.float32),
        tree_pos=np.asarray(tree_pos, np.float32),
        mass=np.asarray(mass, np.float32),
        com=np.asarray(com, np.float32),
        inertia=np.asarray(inertia, np.float32),
        damping=damping,
        armature=armature,
        actuated_dofs=tuple(range(6, 14)),
        gear=np.full(8, 15.0, np.float32),
        limit_lo=limit_lo,
        limit_hi=limit_hi,
        limit_stiffness=40.0,
        geoms=tuple(geoms),
        dt=dt,
        contact_kp=2.0e4,
        contact_kd=120.0,
        friction_mu=1.0,
        contact_force_cap=2000.0,
        max_dof_speed=60.0,
    )


class Ant:
    """Forward-locomotion quadruped (IGE 'Ant' analog)."""

    obs_dim = 34  # 1 height + 4 quat + 3 lin vel + 3 ang vel + 3 up + 8 q + 8 qd + 4 feet
    action_dim = 8
    max_episode_length = 1000
    substeps = 4  # 240 Hz physics, 60 Hz control

    alive_bonus = 0.5
    ctrl_cost = 0.005
    termination_height = 0.22
    init_height = 0.42
    init_knee = 1.0

    def __init__(self):
        self.model = ant_model()

    def init_state(self, rng):
        m = self.model
        k1, k2 = jax.random.split(rng)
        q = jnp.asarray(m.neutral_q())
        q = q.at[2].set(self.init_height)
        knees = jnp.asarray([8, 10, 12, 14]) - 1  # q indices 7..14 are hinges
        # hinge q layout: [7 + 2k] hip, [8 + 2k] knee
        for k in range(4):
            q = q.at[8 + 2 * k].set(self.init_knee)
        q = q.at[7:].add(jax.random.uniform(k1, (8,), jnp.float32, -0.1, 0.1))
        qd = 0.01 * jax.random.normal(k2, (m.nv,), jnp.float32)
        return {"q": q, "qd": qd}

    def _kin(self, q, qd):
        R_wb, p_wb, Xup, S = fwd_kinematics(self.model, q)
        v = jnp.stack(body_velocities(self.model, Xup, S, qd))
        return R_wb, p_wb, v

    def get_obs(self, state):
        m = self.model
        q, qd = state["q"], state["qd"]
        R_wb, p_wb, v = self._kin(q, qd)
        base_quat = q[3:7]
        up = quat_rotate(base_quat, jnp.array([0.0, 0.0, 1.0]))
        lin_vel_world = quat_rotate(base_quat, qd[3:6])
        _, contact_mags = ground_contacts(m, R_wb, p_wb, v)
        feet_contact = (contact_mags[1:] > 1.0).astype(jnp.float32)  # skip torso geom
        return jnp.concatenate(
            [
                q[2:3],  # height
                base_quat,  # orientation
                lin_vel_world,  # world lin vel
                qd[:3],  # body ang vel
                up,  # up-projection vector
                q[7:],  # 8 joint angles
                qd[6:],  # 8 joint velocities
                feet_contact,  # 4
            ]
        )

    def dynamics(self, state, action, rng):
        m = self.model
        q, qd = state["q"], state["qd"]
        x_before = q[0]

        def substep(carry, _):
            q, qd = carry
            R_wb, p_wb, Xup, S = fwd_kinematics(m, q)
            v = jnp.stack(body_velocities(m, Xup, S, qd))
            f_ext, _ = ground_contacts(m, R_wb, p_wb, v)
            q, qd, _ = fd_step(m, q, qd, action, f_ext)
            return (q, qd), None

        (q, qd), _ = jax.lax.scan(substep, (q, qd), None, length=self.substeps)

        dt_ctrl = m.dt * self.substeps
        forward_vel = (q[0] - x_before) / dt_ctrl
        up_proj = quat_rotate(q[3:7], jnp.array([0.0, 0.0, 1.0]))[2]
        reward = (
            forward_vel
            + self.alive_bonus
            - self.ctrl_cost * jnp.sum(jnp.square(action))
        )
        fell = jnp.logical_or(q[2] < self.termination_height, up_proj < 0.3)
        bad = jnp.logical_not(jnp.all(jnp.isfinite(q)))
        terminated = jnp.logical_or(fell, bad)
        reward = jnp.where(terminated, reward - 1.0, reward)
        return {"q": q, "qd": qd}, reward, terminated, {}
