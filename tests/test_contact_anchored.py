"""Anchored-contact (v2) behavioral tests.

The executable spec lives in scripts/contact_lab.py; these are its
fast regression cousins: static friction must HOLD below the Coulomb
cone (the capability the reference's AllegroHand flagship strategy
needs — grasp-and-twist; ref task table pql/utils/common.py:246-275),
slide above it, stay stable in the corner-rocking mode, and conserve
momentum in two-body contacts."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pql_tpu.envs.hand import CUBE_HALF, hand_model
from pql_tpu.physics.contact import (
    box_ground_anchored_s,
    derive_pair,
    point_eff_mass,
    sphere_box_anchored_s,
)
from pql_tpu.physics.dynamics import _kin_s, _vel_s, physics_substeps


def _cube_model():
    return hand_model(n_fingers=0)


def _run_cube(model, extra_wrench, steps, tilt=0.0):
    pp = derive_pair(
        model, point_eff_mass(model, 0, (CUBE_HALF, CUBE_HALF, CUBE_HALF)), n_share=4
    )

    def contact_fn(m, R_wb, p_wb, v, cs):
        cs_new = list(cs)
        f, _ = box_ground_anchored_s(
            m, R_wb, p_wb, v, 0, [CUBE_HALF] * 3, cs, cs_new, 0, pp
        )
        w = extra_wrench(p_wb[0])
        f[0] = [f[0][k] + w[k] for k in range(6)]
        return f, cs_new

    q = jnp.asarray(model.neutral_q()).at[2].set(CUBE_HALF + (0.002 if tilt else 0.0))
    if tilt:
        q = q.at[3:7].set(jnp.array([np.cos(tilt / 2), np.sin(tilt / 2), 0.0, 0.0]))
    qd = jnp.zeros(model.nv)
    cs = jnp.zeros(32)

    @jax.jit
    def roll(q, qd, cs):
        def body(c, _):
            q, qd, cs = c
            q, qd, cs = physics_substeps(
                model, q, qd, jnp.zeros(1), 8, contact_fn=contact_fn, contact_state=cs
            )
            return (q, qd, cs), qd

        (q, qd, cs), qd_t = jax.lax.scan(body, (q, qd, cs), None, length=steps)
        return q, qd_t

    return roll(q, qd, cs)


class TestAnchoredFriction:
    def test_sub_cone_push_holds(self):
        m = _cube_model()
        F = 0.8 * float(m.mass[0]) * 9.81  # below mu=1.2 cone

        q, _ = _run_cube(m, lambda p: [0.0, F * p[2], -F * p[1], F, 0.0, 0.0], 30)
        assert float(jnp.linalg.norm(q[:2])) < 0.003  # <3mm in 0.5s (was ~1m)

    def test_above_cone_slides(self):
        m = _cube_model()
        F = 1.8 * float(m.mass[0]) * 9.81

        q, _ = _run_cube(m, lambda p: [0.0, F * p[2], -F * p[1], F, 0.0, 0.0], 30)
        assert float(jnp.linalg.norm(q[:2])) > 0.05

    def test_tilted_drop_settles(self):
        """The rocking mode (point effective mass I/r² ≈ m/5) must NOT
        pump energy — the round-3 model trampolined off a 3° tilt."""
        m = _cube_model()
        q, qd_t = _run_cube(m, lambda p: [0.0] * 6, 60, tilt=0.03)
        tail = np.asarray(qd_t[30:])
        assert float(np.sqrt(np.mean(tail**2))) < 0.05
        assert abs(float(q[2]) - CUBE_HALF) < 0.005

    def test_sphere_box_equal_opposite(self):
        """Anchored sphere-box wrenches conserve momentum: the world-origin
        wrench sum over both bodies is zero."""
        m = hand_model()
        cube = m.nb - 1
        rng = np.random.RandomState(3)
        q = np.asarray(m.neutral_q(), np.float64)
        q[: m.q_start[cube]] = rng.uniform(0.1, 0.6, m.q_start[cube])
        q[m.q_start[cube] : m.q_start[cube] + 3] = [0.0, 0.0, CUBE_HALF]
        qd = rng.uniform(-0.5, 0.5, m.nv)
        ql = [jnp.asarray(v, jnp.float32) for v in q]
        qdl = [jnp.asarray(v, jnp.float32) for v in qd]
        R_wb, p_wb, Xup, S = _kin_s(m, ql)
        v = _vel_s(m, Xup, S, qdl)
        pps = [derive_pair(m, 0.05, n_share=2) for _ in m.geoms]
        cs = [jnp.zeros(()) for _ in range(4 * len(m.geoms))]
        # engage all anchors with a small offset so spring forces are live
        for i in range(len(m.geoms)):
            cs[4 * i + 3] = jnp.ones(())
        cs_new = list(cs)
        f, _ = sphere_box_anchored_s(
            m, R_wb, p_wb, v, cube, [CUBE_HALF] * 3, cs, cs_new, 0, pps
        )
        total = np.zeros(6)
        for i in range(m.nb):
            total += np.asarray([float(x) for x in f[i]])
        np.testing.assert_allclose(total, 0.0, atol=1e-4)

    def test_anchor_snaps_on_first_touch(self):
        """engaged=0 → no spring force on the first contact substep, and
        the anchor snaps to the tracked point."""
        from pql_tpu.physics.contact import _anchored_force_s, PairParams

        pp = PairParams(kp=1000.0, kd=5.0, mu=1.0, cap=100.0, kpt=1000.0, kdt=5.0)
        normal = [0.0, 0.0, 1.0]
        vel = [jnp.zeros(())] * 3
        dx = [jnp.full((), 0.5), jnp.zeros(()), jnp.zeros(())]  # stale anchor far away
        force, dxt_new, eng = _anchored_force_s(
            jnp.full((), 0.001), normal, vel, dx, jnp.zeros(()), pp
        )
        assert abs(float(force[0])) < 1e-6  # no spring yank from the stale anchor
        assert float(force[2]) > 0.0  # normal force present
        assert all(abs(float(d)) < 1e-6 for d in dxt_new)  # anchor := point
        assert float(eng) == 1.0

    def test_hand_env_carries_contact_state(self):
        from pql_tpu.envs.hand import AllegroHand

        t = AllegroHand()
        s = t.init_state(jax.random.PRNGKey(0))
        assert s["contact"].shape == (4 * t.n_contact_pairs,)
        assert t.obs_dim == t.get_obs(s).shape[0]


class TestVectorizedParity:
    """Pair-vectorized anchored contacts == scalar per-pair loops.

    The _v functions exist purely to shrink trace/compile size (round 5);
    they must be numerically identical to the _s reference loops."""

    def test_hand_contact_fn_matches_scalar_loops(self):
        import jax
        import jax.numpy as jnp

        from pql_tpu.envs.hand import AllegroHand, CUBE_HALF
        from pql_tpu.physics import dynamics as dyn
        from pql_tpu.physics.contact import (
            add_fext_s,
            box_ground_anchored_s,
            ground_anchored_s,
            sphere_box_anchored_s,
        )

        env = AllegroHand()
        m = env.model
        rng = jax.random.PRNGKey(3)
        st = env.init_state(rng)
        # push the cube into fingers/ground a bit for active contacts
        q = st["q"].at[env.cube_q + 2].set(CUBE_HALF * 0.8)
        qd = jax.random.normal(jax.random.PRNGKey(4), (m.nv,)) * 0.3
        cs = jax.random.uniform(jax.random.PRNGKey(5), st["contact"].shape) * 0.01
        # mark half the pairs engaged
        eng = (jnp.arange(env.n_contact_pairs) % 2).astype(jnp.float32)
        cs = cs.at[3::4].set(eng)

        q_l = [q[i] for i in range(m.nq)]
        qd_l = [qd[d] for d in range(m.nv)]
        cs_l = [cs[i] for i in range(cs.shape[0])]
        R_wb, p_wb, Xup, S_axis = dyn._kin_s(m, q_l)
        v = dyn._vel_s(m, Xup, S_axis, qd_l)

        def scalar_fn(m, R_wb, p_wb, v, cs):
            half = [CUBE_HALF] * 3
            cs_new = list(cs)
            f1, idx = ground_anchored_s(m, R_wb, p_wb, v, cs, cs_new, 0, env._pp_ground)
            f2, idx = sphere_box_anchored_s(
                m, R_wb, p_wb, v, env.cube, half, cs, cs_new, idx, env._pp_cube
            )
            f3, _ = box_ground_anchored_s(
                m, R_wb, p_wb, v, env.cube, half, cs, cs_new, idx, env._pp_corner
            )
            return add_fext_s(f1, f2, f3), cs_new

        f_s, cs_s = scalar_fn(m, R_wb, p_wb, v, cs_l)
        f_v, cs_v = env._contact_fn(m, R_wb, p_wb, v, cs_l)

        fs = jnp.asarray([[jnp.asarray(x) for x in row] for row in f_s])
        fv = jnp.asarray([[jnp.asarray(x) for x in row] for row in f_v])
        assert jnp.allclose(fs, fv, atol=1e-4, rtol=1e-4), (
            f"max wrench diff {jnp.max(jnp.abs(fs - fv))}"
        )
        css = jnp.stack([jnp.asarray(x) for x in cs_s])
        csv = jnp.stack([jnp.asarray(x) for x in cs_v])
        assert jnp.allclose(css, csv, atol=1e-5), (
            f"max contact-state diff {jnp.max(jnp.abs(css - csv))}"
        )
