"""Physics-engine validation: analytic golden values and invariants.

These are the quality gates the reference never had (it trusted PhysX):
free-fall kinematics, pendulum dynamics vs the analytic ODE, mass-matrix
symmetry/positive-definiteness, momentum conservation, and contact
stability (ball settles on the plane at rest height).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pql_tpu.physics import (
    FREE,
    Geom,
    HINGE,
    RigidBodyModel,
    fd_step,
    fwd_kinematics,
    ground_contacts,
    mass_matrix,
    body_velocities,
)


def free_ball(radius=0.1, mass=1.0, dt=1e-3, gravity=-9.81):
    return RigidBodyModel(
        nb=1,
        parent=(-1,),
        joint_type=(FREE,),
        joint_axis=np.zeros((1, 3), np.float32),
        tree_pos=np.zeros((1, 3), np.float32),
        mass=np.array([mass], np.float32),
        com=np.zeros((1, 3), np.float32),
        inertia=np.stack([0.4 * mass * radius**2 * np.eye(3, dtype=np.float32)]),
        damping=np.zeros(6, np.float32),
        armature=np.zeros(6, np.float32),
        actuated_dofs=(),
        gear=np.zeros(0, np.float32),
        limit_lo=np.full(6, -np.inf, np.float32),
        limit_hi=np.full(6, np.inf, np.float32),
        limit_stiffness=0.0,
        geoms=(Geom(0, (0.0, 0.0, 0.0), radius),),
        gravity=gravity,
        dt=dt,
    )


def pendulum_model(length=1.0, mass=1.0, dt=1e-3):
    """Point mass on a massless rod hinged at the world origin, swinging
    about the y-axis; com at (0, 0, -L) in the body frame."""
    return RigidBodyModel(
        nb=1,
        parent=(-1,),
        joint_type=(HINGE,),
        joint_axis=np.array([[0.0, 1.0, 0.0]], np.float32),
        tree_pos=np.zeros((1, 3), np.float32),
        mass=np.array([mass], np.float32),
        com=np.array([[0.0, 0.0, -length]], np.float32),
        inertia=np.stack([1e-8 * np.eye(3, dtype=np.float32)]),
        damping=np.zeros(1, np.float32),
        armature=np.zeros(1, np.float32),
        actuated_dofs=(0,),
        gear=np.array([1.0], np.float32),
        limit_lo=np.full(1, -np.inf, np.float32),
        limit_hi=np.full(1, np.inf, np.float32),
        limit_stiffness=0.0,
        geoms=(),
        dt=dt,
    )


def simulate(model, q, qd, steps, action=None, contacts=False):
    action = action if action is not None else jnp.zeros(max(model.nu, 1))

    def step(carry, _):
        q, qd = carry
        if contacts:
            from pql_tpu.physics.dynamics import fwd_kinematics as fk, body_velocities as bv

            R_wb, p_wb, Xup, S = fk(model, q)
            v = bv(model, Xup, S, qd)
            f_ext, _ = ground_contacts(model, R_wb, p_wb, jnp.stack(v))
        else:
            f_ext = jnp.zeros((model.nb, 6))
        q, qd, _ = fd_step(model, q, qd, action[: max(model.nu, 1)], f_ext)
        return (q, qd), None

    (q, qd), _ = jax.lax.scan(step, (q, qd), None, length=steps)
    return q, qd


class TestFreeBody:
    def test_free_fall_kinematics(self):
        model = free_ball()
        q = jnp.asarray(model.neutral_q()).at[2].set(10.0)  # z = 10
        qd = jnp.zeros(6)
        t = 0.5
        steps = int(t / model.dt)
        q, qd = simulate(model, q, qd, steps)
        # semi-implicit Euler: v = g t exactly; z = 10 - g Σ k dt²
        assert float(qd[5]) == pytest.approx(-9.81 * t, rel=1e-3)
        assert float(q[2]) == pytest.approx(10.0 - 0.5 * 9.81 * t**2, rel=5e-3)

    def test_no_gravity_momentum_conserved(self):
        from pql_tpu.physics.spatial import quat_rotate

        model = free_ball(gravity=0.0)
        q = jnp.asarray(model.neutral_q())
        qd = jnp.array([0.3, -0.2, 0.5, 1.0, 2.0, 3.0])
        q2, qd2 = simulate(model, q, qd, 200)
        # free-joint velocity is body-frame: the WORLD quantities conserve
        v_world_0 = quat_rotate(q[3:7], qd[3:6])
        v_world_1 = quat_rotate(q2[3:7], qd2[3:6])
        np.testing.assert_allclose(np.asarray(v_world_1), np.asarray(v_world_0), atol=1e-3)
        # spherical inertia: ω magnitude conserved too
        assert float(jnp.linalg.norm(qd2[:3])) == pytest.approx(
            float(jnp.linalg.norm(qd[:3])), rel=1e-4
        )

    def test_ball_settles_on_plane(self):
        model = free_ball(dt=2e-3)
        q = jnp.asarray(model.neutral_q()).at[2].set(0.5)
        qd = jnp.zeros(6)
        q, qd = simulate(model, q, qd, 2500, contacts=True)
        # rests at penetration equilibrium ≈ radius − mg/kp
        assert float(q[2]) == pytest.approx(0.1 - 9.81 / 2e4, abs=2e-3)
        assert abs(float(qd[5])) < 0.05

    def test_friction_stops_sliding(self):
        model = free_ball(dt=2e-3)
        q = jnp.asarray(model.neutral_q()).at[2].set(0.1)
        qd = jnp.zeros(6).at[3].set(2.0)  # sliding in +x
        q, qd = simulate(model, q, qd, 3000, contacts=True)
        assert abs(float(qd[3])) < 0.2  # friction removed the slide


class TestPendulum:
    def test_equilibrium_at_bottom(self):
        model = pendulum_model()
        q, qd = simulate(model, jnp.zeros(1), jnp.zeros(1), 100)
        # com hangs straight down at θ=0: no motion
        assert abs(float(q[0])) < 1e-6

    def test_matches_analytic_ode(self):
        """θ̈ = −(g/L) sin θ — compare against RK-integrated reference."""
        model = pendulum_model()
        theta0 = 1.0
        q, qd = simulate(model, jnp.full(1, theta0), jnp.zeros(1), 500)

        # reference: integrate with the same semi-implicit scheme
        th, om = theta0, 0.0
        for _ in range(500):
            om += model.dt * (-(9.81 / 1.0) * np.sin(th))
            th += model.dt * om
        assert float(q[0]) == pytest.approx(th, abs=2e-3)
        assert float(qd[0]) == pytest.approx(om, abs=2e-2)

    def test_energy_conservation(self):
        model = pendulum_model(dt=5e-4)

        def energy(q, qd):
            h = -np.cos(float(q[0]))  # com height / L
            return 0.5 * float(qd[0]) ** 2 + 9.81 * h

        q0, qd0 = jnp.full(1, 1.2), jnp.zeros(1)
        e0 = energy(q0, qd0)
        q, qd = simulate(model, q0, qd0, 2000)
        assert energy(q, qd) == pytest.approx(e0, rel=2e-3)

    def test_torque_accelerates(self):
        model = pendulum_model()
        q, qd = simulate(model, jnp.zeros(1), jnp.zeros(1), 100, action=jnp.ones(1) * 1.0)
        assert float(q[0]) > 1e-4  # positive torque about +y swings +θ


class TestMassMatrix:
    def test_symmetric_positive_definite(self):
        from pql_tpu.envs.rigid import ant_model

        model = ant_model()
        rng = np.random.RandomState(0)
        q = jnp.asarray(model.neutral_q())
        # randomize hinges and base orientation
        q = q.at[7:].set(jnp.asarray(rs := rng.uniform(-0.5, 0.5, model.nq - 7), dtype=jnp.float32))
        _, _, Xup, S = fwd_kinematics(model, q)
        M = np.asarray(mass_matrix(model, Xup, S))
        np.testing.assert_allclose(M, M.T, atol=1e-5)
        eig = np.linalg.eigvalsh(M)
        assert eig.min() > 0

    def test_velocity_propagation_chain(self):
        """Two-link chain: tip spatial velocity includes both joint rates."""
        model = pendulum_model()
        q = jnp.zeros(1)
        qd = jnp.ones(1) * 2.0
        _, _, Xup, S = fwd_kinematics(model, q)
        v = body_velocities(model, Xup, S, qd)
        np.testing.assert_allclose(np.asarray(v[0][:3]), [0.0, 2.0, 0.0], atol=1e-6)
