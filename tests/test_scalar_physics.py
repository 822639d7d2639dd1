"""Scalar-unrolled physics core vs the matrix reference implementation.

The training hot path runs pql_tpu.physics.dynamics.physics_step /
fd_step on the scalar-unrolled core (nested lists of per-env scalars, see
pql_tpu.physics.scalar_algebra); the matrix functions (fwd_kinematics,
mass_matrix, bias_forces, spd_solve — reference semantics of
`pql/utils/isaacgym_util.py`'s PhysX layer re-derived from Featherstone)
remain the readable specification. These tests pin the two paths to each
other to f32 roundoff on every model family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pql_tpu.physics import spatial as sp
from pql_tpu.physics.dynamics import (
    _kin_s,
    _vel_s,
    actuation,
    _limit_torque,
    bias_forces,
    body_velocities,
    fd_step,
    fwd_kinematics,
    mass_matrix,
    physics_step,
    spd_solve,
)
from pql_tpu.physics.contact import (
    box_ground_contacts,
    box_ground_contacts_s,
    ground_contacts,
    ground_contacts_s,
    sphere_box_contacts,
    sphere_box_contacts_s,
)
from pql_tpu.physics.model import FREE


def _matrix_fd_step(model, q, qd, action, f_ext_world):
    """The pre-scalar fd_step, kept verbatim as the reference."""
    R_wb, p_wb, Xup, S = fwd_kinematics(model, q)
    v = body_velocities(model, Xup, S, qd)
    M = mass_matrix(model, Xup, S)
    C = bias_forces(model, Xup, S, v, qd, f_ext_world, R_wb, p_wb)
    tau = actuation(model, action, q, qd) + _limit_torque(model, q)
    qdd = spd_solve(M, tau - C)
    qd_new = jnp.clip(qd + model.dt * qdd, -model.max_dof_speed, model.max_dof_speed)
    q_new = q
    for i in range(model.nb):
        qs, vs = model.q_start[i], model.v_start[i]
        if model.joint_type[i] == FREE:
            quat = q[qs + 3 : qs + 7]
            Rb = sp.quat_to_mat(quat)
            omega = qd_new[vs : vs + 3]
            vlin = qd_new[vs + 3 : vs + 6]
            q_new = q_new.at[qs : qs + 3].add(model.dt * (Rb @ vlin))
            q_new = q_new.at[qs + 3 : qs + 7].set(
                sp.quat_integrate(quat, omega, model.dt)
            )
        else:
            q_new = q_new.at[qs].add(model.dt * qd_new[vs])
    return q_new, qd_new


def _rand_state(model, seed):
    rng = np.random.RandomState(seed)
    q = np.asarray(model.neutral_q()).copy()
    q += rng.uniform(-0.2, 0.2, q.shape).astype(np.float32)
    for i in range(model.nb):
        if model.joint_type[i] == FREE:
            qs = model.q_start[i]
            q[qs + 3 : qs + 7] /= np.linalg.norm(q[qs + 3 : qs + 7])
    qd = rng.uniform(-1.0, 1.0, model.nv).astype(np.float32)
    act = rng.uniform(-1.0, 1.0, max(model.nu, 1)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(qd), jnp.asarray(act)


def _stack6(f):
    return jnp.stack([jnp.stack([jnp.asarray(x, jnp.float32) for x in row]) for row in f])


class TestScalarMatrixParity:
    @pytest.mark.parametrize("which", ["ant", "humanoid", "hand"])
    def test_fd_step_matches_matrix(self, which):
        from pql_tpu.envs.hand import hand_model
        from pql_tpu.envs.rigid import ant_model, humanoid_model

        model = {"ant": ant_model, "humanoid": humanoid_model, "hand": hand_model}[which]()
        q, qd, act = _rand_state(model, seed=hash(which) % 1000)
        R_wb, p_wb, Xup, S = fwd_kinematics(model, q)
        v = jnp.stack(body_velocities(model, Xup, S, qd))
        f_ext, _ = ground_contacts(model, R_wb, p_wb, v)
        q1m, qd1m = _matrix_fd_step(model, q, qd, act, f_ext)
        q1s, qd1s, _ = fd_step(model, q, qd, act, f_ext)
        np.testing.assert_allclose(np.asarray(q1s), np.asarray(q1m), atol=5e-6)
        np.testing.assert_allclose(np.asarray(qd1s), np.asarray(qd1m), atol=5e-3)

    def test_contacts_match_matrix(self):
        from pql_tpu.envs.hand import CUBE_HALF, hand_model

        model = hand_model()
        q, qd, _ = _rand_state(model, seed=7)
        R_wb, p_wb, Xup, S = fwd_kinematics(model, q)
        v_arr = jnp.stack(body_velocities(model, Xup, S, qd))
        Rs, ps, Xs, Ss = _kin_s(model, q)
        vl = _vel_s(model, Xs, Ss, [qd[d] for d in range(model.nv)])

        fm, _ = ground_contacts(model, R_wb, p_wb, v_arr)
        fs, _ = ground_contacts_s(model, Rs, ps, vl)
        np.testing.assert_allclose(np.asarray(_stack6(fs)), np.asarray(fm), atol=2e-3)

        cube = model.nb - 1
        half = jnp.full(3, CUBE_HALF)
        fm2, _ = sphere_box_contacts(model, R_wb, p_wb, v_arr, cube, half)
        fs2, _ = sphere_box_contacts_s(model, Rs, ps, vl, cube, [CUBE_HALF] * 3)
        np.testing.assert_allclose(np.asarray(_stack6(fs2)), np.asarray(fm2), atol=2e-3)

        fm3 = box_ground_contacts(model, R_wb, p_wb, v_arr, cube, half)
        fs3 = box_ground_contacts_s(model, Rs, ps, vl, cube, [CUBE_HALF] * 3)
        np.testing.assert_allclose(np.asarray(_stack6(fs3)), np.asarray(fm3), atol=2e-3)

    def test_physics_step_vmaps(self):
        """physics_step vmaps over envs and stays finite with contacts."""
        from pql_tpu.envs.rigid import ant_model

        model = ant_model()
        B = 8
        qs, qds, acts = [], [], []
        for b in range(B):
            q, qd, act = _rand_state(model, seed=100 + b)
            qs.append(q), qds.append(qd), acts.append(act)
        q, qd, act = jnp.stack(qs), jnp.stack(qds), jnp.stack(acts)

        def one(q, qd, a):
            return physics_step(
                model, q, qd, a,
                contact_fn=lambda m, R, p, v: ground_contacts_s(m, R, p, v)[0],
            )

        q1, qd1 = jax.vmap(one)(q, qd, act)
        assert q1.shape == q.shape and qd1.shape == qd.shape
        assert bool(jnp.all(jnp.isfinite(q1))) and bool(jnp.all(jnp.isfinite(qd1)))


class TestPositionControl:
    """control_mode='position': the per-substep PD servo (IGE DOF_MODE_POS
    analog — stiffness/damping/effort-cap; see physics/model.py) drives
    actuated hinges to the commanded target and holds there."""

    def test_servo_reaches_and_holds_target(self):
        import numpy as np

        import jax
        import jax.numpy as jnp

        from pql_tpu.envs.hand import hand_model
        from pql_tpu.physics.dynamics import physics_substeps

        m = hand_model(n_fingers=1, control_mode="position")
        assert m.control_mode == "position"
        q = jnp.asarray(m.neutral_q())
        qd = jnp.zeros(m.nv)
        # command: abduction to 0.3 of range, curls to 1.0 rad (mapped
        # through the model's actual limits)
        lo, hi = float(m.limit_lo[1]), float(m.limit_hi[1])
        mid, halfr = 0.5 * (lo + hi), 0.5 * (hi - lo)
        a = np.zeros(m.nu, np.float32)
        a[0] = 0.3
        a[1:] = (1.0 - mid) / halfr
        step = jax.jit(lambda q, qd: physics_substeps(m, q, qd, jnp.asarray(a), 8))
        for _ in range(90):
            q, qd = step(q, qd)
        dof = np.asarray(q[: m.nu])
        assert abs(dof[0] - 0.3 * 0.47) < 0.05, dof
        assert np.abs(dof[1:] - 1.0).max() < 0.05, dof
        # torque mode with the same action does NOT settle at the target
        mt = hand_model(n_fingers=1, control_mode="torque")
        qt, qdt = jnp.asarray(mt.neutral_q()), jnp.zeros(mt.nv)
        step_t = jax.jit(lambda q, qd: physics_substeps(mt, q, qd, jnp.asarray(a), 8))
        for _ in range(90):
            qt, qdt = step_t(qt, qdt)
        assert np.abs(np.asarray(qt[: mt.nu])[1:] - 1.0).max() > 0.2
