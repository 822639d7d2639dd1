"""AllegroHand-class in-hand cube reorientation on the in-repo engine.

The reference's flagship benchmark is IsaacGymEnvs 'AllegroHand' at 16384
envs (reference pql/utils/common.py:246-275, BASELINE.md): a 16-DOF
four-finger hand must rotate a free cube to a target orientation;
reward ∝ 1/(rot_dist + ε), success at rot_dist < threshold with goal
re-sampling, fall penalty on dropping the cube. This JAX-native analog
keeps that task structure — 16 torque-actuated finger joints curling over
a palm plane (the ground), a free cube with sphere-vs-box and corner-vs-
plane penalty contacts, quaternion-distance reward with goal resets — on
simplified finger kinematics (4 fingers × 4 curl links).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pql_tpu.physics import FREE, Geom, HINGE, RigidBodyModel
from pql_tpu.physics.contact import (
    add_fext_s,
    bowl_anchored_v,
    box_ground_anchored_v,
    box_ground_contacts,
    box_ground_contacts_s,
    derive_pair,
    ground_anchored_v,
    ground_contacts,
    ground_contacts_s,
    point_eff_mass,
    sphere_box_anchored_v,
    sphere_box_contacts,
    sphere_box_contacts_s,
)
from pql_tpu.physics.dynamics import (
    body_velocities,
    fd_step,
    fwd_kinematics,
    physics_step,
    physics_substeps,
)
from pql_tpu.physics.spatial import quat_inv, quat_mul

CUBE_HALF = 0.035
N_FINGERS = 4
LINKS_PER_FINGER = 4
LINK_LEN = 0.05
FINGER_BASE_R = 0.11
FINGER_BASE_Z = 0.035


def hand_model(
    dt: float = 1.0 / 480.0,
    n_fingers: int = N_FINGERS,
    control_mode: str = "position",
) -> RigidBodyModel:
    """n_fingers × (1 abduction + 3 curl) hinges anchored at the palm rim
    + a free cube — the real Allegro DOF layout (4 DOF/finger, of which
    the proximal joint swings the finger sideways).

    Bodies 0..n_dof-1: finger links (parent chains anchored at the palm
    rim, pointing inward; link 0's hinge axis is the palm normal
    [abduction], links 1-3 curl about the rim tangent); last body: the
    cube. Abduction is what lets the fingertips drag the cube about the
    vertical axis — with 4 pure-curl joints, yaw reorientation targets
    are nearly unreachable. 4 fingers = the Allegro hand; 5 = the
    Shadow-hand analog.
    """
    parent, joint_type, joint_axis, tree_pos = [], [], [], []
    mass, com, inertia, geoms = [], [], [], []

    m_link = 0.06
    z = np.array([0.0, 0.0, 1.0])  # palm normal = abduction axis
    for f in range(n_fingers):
        phi = np.pi / 4 + f * 2 * np.pi / n_fingers  # rim anchors
        d = np.array([np.cos(phi), np.sin(phi), 0.0])  # outward
        t = np.array([-np.sin(phi), np.cos(phi), 0.0])  # curl axis
        for l in range(LINKS_PER_FINGER):
            body = f * LINKS_PER_FINGER + l
            parent.append(-1 if l == 0 else body - 1)
            joint_type.append(HINGE)
            joint_axis.append(z if l == 0 else t)
            tree_pos.append(
                np.array([*(FINGER_BASE_R * d[:2]), FINGER_BASE_Z])
                if l == 0
                else -LINK_LEN * d
            )
            mass.append(m_link)
            com.append(-0.5 * LINK_LEN * d)
            i_perp = m_link * LINK_LEN**2 / 3.0
            eye = np.eye(3)
            inertia.append(i_perp * (eye - np.outer(d, d)) + 1e-6 * eye)
            # m_eff: apparent mass of the finger chain at this link's tip
            # (link inertia + reflected motor armature through the chain;
            # see contact.derive_pair) — sets stable per-pair contact gains
            geoms.append(Geom(body, tuple(-LINK_LEN * d), 0.016, m_eff=0.1))

    # the cube (last body)
    cube = n_fingers * LINKS_PER_FINGER
    m_cube = 0.1
    parent.append(-1)
    joint_type.append(FREE)
    joint_axis.append(np.zeros(3))
    tree_pos.append(np.zeros(3))
    mass.append(m_cube)
    com.append(np.zeros(3))
    inertia.append((m_cube / 6.0) * (2 * CUBE_HALF) ** 2 * np.eye(3))

    n_dof = n_fingers * LINKS_PER_FINGER
    nv = n_dof + 6
    limit_lo = np.full(nv, -np.inf, np.float32)
    limit_hi = np.full(nv, np.inf, np.float32)
    for dof in range(n_dof):
        if dof % LINKS_PER_FINGER == 0:
            # abduction: ±0.47 rad (Allegro joint-0 spec)
            limit_lo[dof], limit_hi[dof] = -0.47, 0.47
        else:
            # curl range: hyperextension to -0.6 (the real hand's -0.3,
            # scaled for this compressed palm geometry) so a retracting
            # finger LIFTS CLEAR of the cube — without that clearance the
            # regrasp half of finger gaiting is geometrically blocked
            # (measured: abduction recentering stalls against the held
            # cube; VERDICT r5 item 4 sanctions iterating joint ranges)
            limit_lo[dof], limit_hi[dof] = -0.6, 1.6
    damping = np.zeros(nv, np.float32)
    damping[:n_dof] = 0.08
    # reflected motor inertia: the real Allegro's gearmotors dominate the
    # apparent fingertip mass; raising armature both matches that and
    # stabilizes fingertip contacts (apparent tip mass ~0.15 kg vs ~0.05
    # at the old 0.002 — stiffer stable friction gains, less chatter)
    armature = np.zeros(nv, np.float32)
    armature[:n_dof] = 0.01

    return RigidBodyModel(
        nb=n_dof + 1,
        parent=tuple(parent),
        joint_type=tuple(joint_type),
        joint_axis=np.asarray(joint_axis, np.float32),
        tree_pos=np.asarray(tree_pos, np.float32),
        mass=np.asarray(mass, np.float32),
        com=np.asarray(com, np.float32),
        inertia=np.asarray(inertia, np.float32),
        damping=damping,
        armature=armature,
        actuated_dofs=tuple(range(n_dof)),
        gear=np.full(n_dof, 0.6, np.float32),
        limit_lo=limit_lo,
        limit_hi=limit_hi,
        limit_stiffness=5.0,
        geoms=tuple(geoms),
        dt=dt,
        contact_kp=3.0e3,
        contact_kd=20.0,
        friction_mu=1.2,
        contact_force_cap=80.0,
        max_dof_speed=30.0,
        # IGE AllegroHand drives joints in POSITION mode (DOF_MODE_POS,
        # stiffness 3.0, damping 0.1, effort ~0.7 N*m) — policies command
        # target angles, the engine-side PD holds them. Torque-mode
        # actions made sustained grasps needlessly hard to learn
        # (the policy had to output gravity-compensating torques).
        control_mode=control_mode,
        act_kp=3.0,
        act_kd=0.1,
    )


def _rand_quat(rng):
    """Uniform random unit quaternion (Shoemake)."""
    u1, u2, u3 = jax.random.uniform(rng, (3,))
    a, b = jnp.sqrt(1.0 - u1), jnp.sqrt(u1)
    return jnp.stack(
        [
            a * jnp.sin(2 * jnp.pi * u2),
            a * jnp.cos(2 * jnp.pi * u2),
            b * jnp.sin(2 * jnp.pi * u3),
            b * jnp.cos(2 * jnp.pi * u3),
        ]
    )


def rot_dist(q1, q2):
    """Angle of the relative rotation between two unit quats."""
    qd = quat_mul(q1, quat_inv(q2))
    return 2.0 * jnp.arcsin(jnp.clip(jnp.linalg.norm(qd[1:]), 0.0, 1.0))


class AllegroHand:
    """In-hand cube reorientation (IGE 'AllegroHand' analog)."""

    n_fingers = N_FINGERS
    n_dof = N_FINGERS * LINKS_PER_FINGER
    obs_dim = 16 + 16 + 3 + 4 + 3 + 3 + 4 + 4  # = 53
    action_dim = 16
    max_episode_length = 600
    substeps = 8  # 480 Hz physics, 60 Hz control

    # reward constants per IsaacGymEnvs AllegroHand (the reference's
    # flagship task config — the 3000 eval threshold in BASELINE.md is
    # calibrated to THESE values: successTolerance 0.1, reachGoalBonus 250,
    # fallDistance 0.24, fallPenalty 0, rotEps 0.1, actionPenaltyScale
    # 0.0002; ref entry pql/utils/common.py:246-275)
    success_tolerance = 0.1
    reach_goal_bonus = 250.0
    fall_penalty = 0.0
    fall_dist = 0.24
    rot_eps = 0.1
    action_penalty = 0.0002

    # IGE AllegroHand joint drive: position PD (see hand_model); the
    # contact lab's scripted-gait scenarios use an explicit torque-mode
    # variant (contact authority is identical — only actuation differs)
    control_mode = "position"

    # palm geometry: "bowl" cradles the cube in a shallow spherical
    # concavity the way IGE's palm-up hand supports it — fingertips can
    # ROLL the cube continuously, where the flat plane demands discrete
    # stick-twist-release gaiting (round-5 flagship diagnosis,
    # LEARNING.md). The bowl is EXPERIMENTAL (inside the rim only;
    # plane outside): the scripted-solvability scenarios are tuned for
    # the flat palm, so flat stays the default until a bowl-tuned gait
    # and an RL A/B validate the switch.
    palm = "flat"
    bowl_radius = 0.09

    def __init__(self):
        self.model = hand_model(
            n_fingers=self.n_fingers, control_mode=self.control_mode
        )
        self.cube = self.n_fingers * LINKS_PER_FINGER
        self.cube_q = self.model.q_start[self.cube]
        self.cube_v = self.model.v_start[self.cube]
        m = self.model
        # anchored-contact pair gains (trace-time constants): finger-link
        # spheres vs ground, finger spheres vs cube (2 fingers typically
        # share the squeeze), cube corners vs ground (4 share the weight)
        m_cube_face = point_eff_mass(m, self.cube, (CUBE_HALF, 0.0, 0.0))
        m_corner = point_eff_mass(m, self.cube, (CUBE_HALF, CUBE_HALF, CUBE_HALF))
        self._pp_ground = [
            derive_pair(
                m, point_eff_mass(m, g.body, g.offset) if g.m_eff is None else g.m_eff
            )
            for g in m.geoms
        ]
        # Finger-cube pairs: springs at full stiffness (soft springs sink
        # fingertips ~5 mm into the cube and flip the inside-box normal
        # branch — measured loss of all drag authority), but the
        # TANGENTIAL viscous slope kdt reduced 4x: at the derived bound
        # the cube's low-effective-mass ROTATIONAL mode is viscously
        # UNSTABLE — a statically squeezed cube chattered at
        # |w| ~ 10-50 rad/s, saturating the angular-velocity obs in every
        # r5 flagship rollout (LEARNING.md). kdt x0.25 kills the chatter
        # outright (measured |w| -> 0.00) with stick and penetration
        # depth unchanged.
        from pql_tpu.physics.contact import PairParams

        self._pp_cube = [
            derive_pair(
                m,
                1.0 / (1.0 / (0.1 if g.m_eff is None else g.m_eff) + 1.0 / m_cube_face),
                n_share=2,
            )
            for g in m.geoms
        ]
        self._pp_cube = [
            PairParams(
                kp=p.kp, kd=p.kd, mu=p.mu, cap=p.cap, kpt=p.kpt, kdt=0.25 * p.kdt
            )
            for p in self._pp_cube
        ]
        self._pp_corner = derive_pair(m, m_corner, n_share=4)
        self.n_contact_pairs = 2 * len(m.geoms) + 8
        # bowl palm: center height so the cube's rest pose (bottom-face
        # corners on the shell) sits at the same height as on the flat
        # palm — zc = sqrt(R^2 - 2*half^2), bottom corners at z = 0.
        # Bowl gains derive with n_share=8: opposing corners' inward
        # normals CONVERGE, so springs load each other pairwise and the
        # plane-stable gains chatter (measured: the cube trampolines).
        self._pp_bowl = derive_pair(m, m_corner, n_share=8)
        self._bowl_center = (
            0.0,
            0.0,
            float(np.sqrt(self.bowl_radius**2 - 2.0 * CUBE_HALF**2)),
        )

    def init_state(self, rng):
        m = self.model
        k1, k2, k3 = jax.random.split(rng, 3)
        q = jnp.asarray(m.neutral_q())
        # fingers slightly curled; abduction joints (every 4th dof) centered
        is_abduct = (jnp.arange(self.n_dof) % LINKS_PER_FINGER) == 0
        q = q.at[: self.n_dof].set(
            jnp.where(is_abduct, 0.0, 0.2)
            + jax.random.uniform(k1, (self.n_dof,), jnp.float32, -0.1, 0.1)
        )
        # cube resting above the palm center
        q = q.at[self.cube_q : self.cube_q + 3].set(
            jnp.array([0.0, 0.0, CUBE_HALF + 0.002])
        )
        q = q.at[self.cube_q + 3 : self.cube_q + 7].set(_rand_quat(k2))
        qd = jnp.zeros(m.nv)
        return {
            "q": q,
            "qd": qd,
            "target": _rand_quat(k3),
            # anchored-contact state: 4 scalars (anchor xyz + engaged) per
            # pair; engaged=0 → anchors snap on first touch
            "contact": jnp.zeros(4 * self.n_contact_pairs),
        }

    def _cube_pose(self, q):
        return q[self.cube_q : self.cube_q + 3], q[self.cube_q + 3 : self.cube_q + 7]

    def get_obs(self, state):
        q, qd = state["q"], state["qd"]
        pos, quat = self._cube_pose(q)
        qdiff = quat_mul(quat, quat_inv(state["target"]))
        return jnp.concatenate(
            [
                q[: self.n_dof],
                qd[: self.n_dof],
                pos,
                quat,
                qd[self.cube_v + 3 : self.cube_v + 6],  # cube lin vel (body)
                qd[self.cube_v : self.cube_v + 3],  # cube ang vel (body)
                state["target"],
                qdiff,
            ]
        )

    def _contact_fn(self, m, R_wb, p_wb, v, cs):
        """Stateful anchored contacts (static friction — the capability
        the grasp-and-twist strategy needs; see contact.py v2 notes).
        Pair-vectorized: identical semantics to the *_anchored_s loops
        (parity-tested) at a fraction of the trace/compile size."""
        half = [CUBE_HALF] * 3
        cs_new = list(cs)
        f1, idx = ground_anchored_v(m, R_wb, p_wb, v, cs, cs_new, 0, self._pp_ground)
        f2, idx = sphere_box_anchored_v(
            m, R_wb, p_wb, v, self.cube, half, cs, cs_new, idx, self._pp_cube
        )
        if self.palm == "bowl":
            f3, _ = bowl_anchored_v(
                m, R_wb, p_wb, v, self.cube, half, self._bowl_center,
                self.bowl_radius, cs, cs_new, idx, self._pp_bowl,
            )
        else:
            f3, _ = box_ground_anchored_v(
                m, R_wb, p_wb, v, self.cube, half, cs, cs_new, idx, self._pp_corner
            )
        return add_fext_s(f1, f2, f3), cs_new

    def dynamics(self, state, action, rng):
        m = self.model

        q, qd, contact = physics_substeps(
            m, state["q"], state["qd"], action, self.substeps,
            contact_fn=self._contact_fn, contact_state=state["contact"],
        )
        pos, quat = self._cube_pose(q)
        dist = rot_dist(quat, state["target"])
        success = dist < self.success_tolerance
        # IGE-style fall check: cube strays from the palm workspace
        rest = jnp.array([0.0, 0.0, CUBE_HALF])
        fallen = jnp.linalg.norm(pos - rest) > self.fall_dist

        reward = (
            1.0 / (dist + self.rot_eps)
            - self.action_penalty * jnp.sum(jnp.square(action))
            + jnp.where(success, self.reach_goal_bonus, 0.0)
            + jnp.where(fallen, self.fall_penalty, 0.0)
        )
        # goal re-sampling on success (IGE keeps the episode running)
        new_target = jnp.where(success, _rand_quat(rng), state["target"])
        bad = jnp.logical_not(jnp.all(jnp.isfinite(q)))
        terminated = jnp.logical_or(fallen, bad)
        next_state = {"q": q, "qd": qd, "target": new_target, "contact": contact}
        return next_state, reward, terminated, {"success": success.astype(jnp.float32)}


class ShadowHand(AllegroHand):
    """Five-finger in-hand cube reorientation (IGE 'ShadowHand' analog:
    the reference runs it at 16384 envs with the same PPO presets as
    AllegroHand, pql/utils/common.py:246-275; 20 actuated curl DOF here
    vs the real hand's 20-of-24)."""

    n_fingers = 5
    n_dof = 5 * LINKS_PER_FINGER
    obs_dim = 20 + 20 + 3 + 4 + 3 + 3 + 4 + 4  # = 61
    action_dim = 20
