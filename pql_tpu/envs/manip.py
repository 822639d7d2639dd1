"""Arm manipulation tasks.

FrankaCubeStack (IGE analog; the reference runs it at 8192 envs with a
dedicated PPO preset, pql/utils/common.py:261-266 and reward_scale 0.1):
a 7-DOF torque-controlled arm must pick cube A and stack it on cube B.
The in-repo engine has penalty contacts but no closed-loop grasping, so
grasping uses the standard simplified mechanic: when the gripper action
closes while the end-effector is within grasp range of cube A, the cube
rigidly attaches to the EE; opening releases it. The reward is the IGE
task's staged shaping: reach → lift → align → stack.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pql_tpu.physics import FREE, Geom, HINGE, RigidBodyModel
from pql_tpu.physics.dynamics import fd_step, fwd_kinematics, physics_step, physics_substeps

CUBE_A_HALF = 0.025
CUBE_B_HALF = 0.035


def franka_model(dt: float = 1.0 / 120.0) -> RigidBodyModel:
    """7-hinge serial arm anchored at the origin (Franka-like alternating
    yaw/pitch axes and link lengths); no free bodies — the cubes are
    integrated analytically in the task (attach mechanic)."""
    link_len = [0.333, 0.316, 0.0825, 0.384, 0.0825, 0.088, 0.107]
    axes = [
        [0, 0, 1], [0, 1, 0], [0, 0, 1], [0, -1, 0], [0, 0, 1], [0, -1, 0], [0, 0, 1]
    ]
    masses = [3.0, 3.0, 2.5, 2.5, 2.0, 1.5, 0.5]

    parent, joint_type, joint_axis, tree_pos = [], [], [], []
    mass, com, inertia, geoms = [], [], [], []
    up = np.array([0.0, 0.0, 1.0])
    for i in range(7):
        parent.append(i - 1)
        joint_type.append(HINGE)
        joint_axis.append(np.asarray(axes[i], np.float32))
        tree_pos.append((link_len[i - 1] if i > 0 else 0.0) * up)
        mass.append(masses[i])
        com.append(0.5 * link_len[i] * up)
        i_perp = masses[i] * link_len[i] ** 2 / 3.0
        inertia.append(i_perp * (np.eye(3) - np.outer(up, up)) + 1e-3 * np.eye(3))

    nv = 7
    limit_lo = np.array([-2.9, -1.76, -2.9, -3.07, -2.9, -0.02, -2.9], np.float32)
    limit_hi = np.array([2.9, 1.76, 2.9, -0.07, 2.9, 3.75, 2.9], np.float32)
    damping = np.full(nv, 2.0, np.float32)
    armature = np.full(nv, 0.1, np.float32)
    return RigidBodyModel(
        nb=7,
        parent=tuple(parent),
        joint_type=tuple(joint_type),
        joint_axis=np.asarray(joint_axis, np.float32),
        tree_pos=np.asarray(tree_pos, np.float32),
        mass=np.asarray(mass, np.float32),
        com=np.asarray(com, np.float32),
        inertia=np.asarray(inertia, np.float32),
        damping=damping,
        armature=armature,
        actuated_dofs=tuple(range(7)),
        gear=np.array([87, 87, 87, 87, 12, 12, 12], np.float32),
        limit_lo=limit_lo,
        limit_hi=limit_hi,
        limit_stiffness=60.0,
        geoms=(Geom(6, (0.0, 0.0, 0.107), 0.03),),
        dt=dt,
        contact_kp=0.0,
        contact_kd=0.0,
        friction_mu=0.0,
        contact_force_cap=0.0,
        max_dof_speed=10.0,
    )


class FrankaCubeStack:
    """Stack cube A onto cube B (IGE 'FrankaCubeStack' analog).

    Action [8]: 7 joint torques + gripper (> 0 closes). Staged reward
    mirroring the IGE shaping: distance-to-cubeA reach term, lift term
    once grasped, align term toward above-cubeB, stack bonus when A rests
    on B within tolerance.
    """

    obs_dim = 7 + 7 + 3 + 3 + 3 + 3 + 1  # q, qd, ee, cubeA, cubeB, A-to-B, grasped
    action_dim = 8
    max_episode_length = 300
    substeps = 2

    table_z = 0.0
    grasp_range = 0.05
    stack_tol = 0.02
    lift_height = 0.15

    def __init__(self):
        self.model = franka_model()

    def _ee_pos(self, q):
        m = self.model
        R_wb, p_wb, _, _ = fwd_kinematics(m, q)
        tip_local = jnp.array([0.0, 0.0, 0.107])
        return p_wb[6] + R_wb[6] @ tip_local

    def init_state(self, rng):
        m = self.model
        k1, k2, k3 = jax.random.split(rng, 3)
        q = jnp.asarray(m.neutral_q())
        q = q + jax.random.uniform(k1, (7,), jnp.float32, -0.1, 0.1)
        # neutral elbow-up pose
        q = q.at[1].set(-0.5)
        q = q.at[3].set(-2.0)
        q = q.at[5].set(1.8)
        cube_a = jnp.concatenate(
            [jax.random.uniform(k2, (2,), jnp.float32, 0.25, 0.45),
             jnp.array([self.table_z + CUBE_A_HALF])]
        )
        cube_b = jnp.concatenate(
            [jax.random.uniform(k3, (2,), jnp.float32, -0.45, -0.25),
             jnp.array([self.table_z + CUBE_B_HALF])]
        )
        return {
            "q": q,
            "qd": jnp.zeros(m.nv, jnp.float32),
            "cube_a": cube_a,
            "cube_b": cube_b,
            "grasped": jnp.zeros((), jnp.float32),
        }

    def get_obs(self, state):
        ee = self._ee_pos(state["q"])
        return jnp.concatenate(
            [
                state["q"], state["qd"], ee, state["cube_a"], state["cube_b"],
                state["cube_b"] - state["cube_a"], state["grasped"][None],
            ]
        )

    def dynamics(self, state, action, rng):
        m = self.model
        arm_action, grip = action[:7], action[7]

        q, qd = physics_substeps(
            m, state["q"], state["qd"], arm_action, self.substeps, contact_fn=None
        )
        ee = self._ee_pos(q)

        # grasp/release mechanic
        near_a = jnp.linalg.norm(ee - state["cube_a"]) < self.grasp_range
        grasped = jnp.where(
            state["grasped"] > 0.5,
            (grip > 0.0).astype(jnp.float32),  # keep while closed
            jnp.logical_and(near_a, grip > 0.0).astype(jnp.float32),
        )
        # attached cube follows the EE; released cube falls to the table
        cube_a = jnp.where(
            grasped > 0.5,
            ee - jnp.array([0.0, 0.0, CUBE_A_HALF]),
            state["cube_a"].at[2].set(
                jnp.maximum(state["cube_a"][2] - 0.02, self.table_z + CUBE_A_HALF)
            ),
        )
        cube_b = state["cube_b"]

        # staged shaping (IGE FrankaCubeStack reward structure)
        d_reach = jnp.linalg.norm(ee - state["cube_a"])
        stack_target = cube_b + jnp.array([0.0, 0.0, CUBE_B_HALF + CUBE_A_HALF])
        d_align = jnp.linalg.norm(cube_a - stack_target)
        lifted = cube_a[2] > self.table_z + self.lift_height
        stacked = jnp.logical_and(
            d_align < self.stack_tol, grasped < 0.5
        )
        reward = (
            (1.0 - jnp.tanh(10.0 * d_reach))  # reach
            + jnp.where(grasped > 0.5, 0.5, 0.0)  # grasp
            + jnp.where(jnp.logical_and(grasped > 0.5, lifted), 0.5, 0.0)  # lift
            + jnp.where(grasped > 0.5, 1.0 - jnp.tanh(5.0 * d_align), 0.0)  # align
            + jnp.where(stacked, 16.0, 0.0)  # stack bonus (IGE: large terminal)
            - 0.0001 * jnp.sum(jnp.square(arm_action))
        )
        bad = jnp.logical_not(jnp.all(jnp.isfinite(q)))
        terminated = jnp.logical_or(stacked, bad)
        next_state = {
            "q": q, "qd": qd, "cube_a": cube_a, "cube_b": cube_b, "grasped": grasped
        }
        return next_state, reward, terminated, {"success": stacked.astype(jnp.float32)}
