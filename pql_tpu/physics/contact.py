"""Penalty-based contacts: sphere–ground and sphere–box.

Compliant (spring–damper) contact with smooth Coulomb friction — the
standard penalty formulation used by differentiable JAX physics engines.
All geoms are spheres attached to bodies (model.geoms); the ground is the
plane z = 0; boxes are contact *targets* for manipulation tasks (a free
cube body with a half-extent, tested against every sphere).

Forces are returned as [nb, 6] world-frame spatial forces about the world
origin ([n; f] with n = p × f), ready for pql_tpu.physics.dynamics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pql_tpu.physics.model import RigidBodyModel


def _point_state(R_wb, p_wb, v_body, body, offset):
    """World position and velocity of a body-frame point."""
    R = R_wb[body]
    pos = p_wb[body] + R @ offset
    omega, vlin = v_body[body][:3], v_body[body][3:]
    vel = R @ (vlin + jnp.cross(omega, offset))
    return pos, vel


def _contact_force(depth, normal, vel, kp, kd, mu, cap=1.0e4):
    """Spring-damper normal force + smooth Coulomb friction.

    depth > 0 means penetration. Returns world-frame force (3,); the
    normal force is capped at `cap` so deep penetrations from fast
    impacts cannot inject unbounded energy (numerical-safety rail).
    """
    active = depth > 0.0
    vn = jnp.dot(vel, normal)
    fn_mag = jnp.minimum(jnp.maximum(kp * depth - kd * vn, 0.0), cap) * active
    vt = vel - vn * normal
    vt_norm = jnp.linalg.norm(vt) + 1e-6
    ft = -jnp.minimum(mu * fn_mag, 2.0 * kd * vt_norm) * vt / vt_norm
    return fn_mag * normal + ft


def ground_contacts(model: RigidBodyModel, R_wb, p_wb, v_body):
    """Sphere-vs-plane(z=0) penalty forces. Returns ([nb,6] f_ext_world,
    per-geom contact force magnitudes [n_geoms])."""
    f_ext = jnp.zeros((model.nb, 6))
    mags = []
    for g in model.geoms:
        pos, vel = _point_state(R_wb, p_wb, v_body, g.body, jnp.asarray(g.offset))
        depth = g.radius - pos[2]
        force = _contact_force(
            depth,
            jnp.array([0.0, 0.0, 1.0]),
            vel,
            model.contact_kp,
            model.contact_kd,
            model.friction_mu,
            model.contact_force_cap,
        )
        torque = jnp.cross(pos, force)
        f_ext = f_ext.at[g.body].add(jnp.concatenate([torque, force]))
        mags.append(jnp.linalg.norm(force))
    return f_ext, jnp.stack(mags) if mags else jnp.zeros(0)


def box_ground_contacts(
    model: RigidBodyModel,
    R_wb,
    p_wb,
    v_body,
    box_body: int,
    half_extents: jax.Array,
):
    """Oriented box (attached at `box_body` origin) vs the ground plane:
    its 8 corners act as point contacts. Returns [nb,6] world forces."""
    f_ext = jnp.zeros((model.nb, 6))
    Rb, pb = R_wb[box_body], p_wb[box_body]
    hx, hy, hz = half_extents[0], half_extents[1], half_extents[2]
    corners = jnp.array(
        [[sx * hx, sy * hy, sz * hz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    omega, vlin = v_body[box_body][:3], v_body[box_body][3:]
    for c in range(8):
        local = corners[c]
        pos = pb + Rb @ local
        vel = Rb @ (vlin + jnp.cross(omega, local))
        depth = -pos[2]
        force = _contact_force(
            depth,
            jnp.array([0.0, 0.0, 1.0]),
            vel,
            model.contact_kp,
            model.contact_kd,
            model.friction_mu,
            model.contact_force_cap,
        )
        torque = jnp.cross(pos, force)
        f_ext = f_ext.at[box_body].add(jnp.concatenate([torque, force]))
    return f_ext


def sphere_box_contacts(
    model: RigidBodyModel,
    R_wb,
    p_wb,
    v_body,
    box_body: int,
    half_extents: jax.Array,
):
    """Every model sphere vs an oriented box attached to `box_body` (at its
    body origin). Equal-and-opposite forces applied to both bodies —
    momentum-conserving. Returns ([nb,6] f_ext_world, [n_geoms] magnitudes)."""
    f_ext = jnp.zeros((model.nb, 6))
    Rb, pb = R_wb[box_body], p_wb[box_body]
    mags = []
    for g in model.geoms:
        if g.body == box_body:
            mags.append(jnp.zeros(()))
            continue
        pos, vel = _point_state(R_wb, p_wb, v_body, g.body, jnp.asarray(g.offset))
        # sphere center in box frame
        local = Rb.T @ (pos - pb)
        closest = jnp.clip(local, -half_extents, half_extents)
        delta = local - closest
        dist = jnp.linalg.norm(delta) + 1e-9
        inside = jnp.all(jnp.abs(local) < half_extents)
        # outside: normal from closest point to center; inside: push out along
        # the shallowest face (approximate: use largest |local|/extent axis)
        n_out = delta / dist
        ax = jnp.argmax(jnp.abs(local) / half_extents)
        n_in = jnp.sign(local[ax]) * jax.nn.one_hot(ax, 3)
        normal_local = jnp.where(inside, n_in, n_out)
        depth = jnp.where(inside, g.radius + jnp.min(half_extents - jnp.abs(closest)), g.radius - dist)
        normal = Rb @ normal_local

        box_point_vel = Rb @ (
            v_body[box_body][3:] + jnp.cross(v_body[box_body][:3], Rb.T @ (pos - pb))
        )
        rel_vel = vel - box_point_vel
        force = _contact_force(
            depth, normal, rel_vel, model.contact_kp, model.contact_kd,
            model.friction_mu, model.contact_force_cap,
        )
        torque = jnp.cross(pos, force)
        f_ext = f_ext.at[g.body].add(jnp.concatenate([torque, force]))
        f_ext = f_ext.at[box_body].add(jnp.concatenate([-torque, -force]))
        mags.append(jnp.linalg.norm(force))
    return f_ext, jnp.stack(mags) if mags else jnp.zeros(0)


# =====================================================================
# Scalar-unrolled contact path (see pql_tpu.physics.scalar_algebra and
# the rationale in pql_tpu.physics.dynamics — no [B, nb, 6] padded
# intermediates). Semantics identical to the matrix functions above;
# used by dynamics.physics_step via contact closures.
# =====================================================================

from pql_tpu.physics import scalar_algebra as sa  # noqa: E402


def _point_state_s(R_wb, p_wb, v, body, offset):
    """World position/velocity (v3 lists) of a body-frame point (floats)."""
    R = R_wb[body]
    pos = sa.v3_add(p_wb[body], sa.m33_vec(R, offset))
    omega, vlin = v[body][:3], v[body][3:]
    vel = sa.m33_vec(R, sa.v3_add(vlin, sa.v3_cross(omega, offset)))
    return pos, vel


def _contact_force_s(depth, normal, vel, kp, kd, mu, cap):
    """Scalar twin of _contact_force (normal: v3 list)."""
    active = depth > 0.0
    vn = sa.v3_dot(vel, normal)
    fn_mag = jnp.minimum(jnp.maximum(kp * depth - kd * vn, 0.0), cap) * active
    vt = sa.v3_sub(vel, sa.v3_scale(normal, vn))
    vt_norm = sa.v3_norm(vt) + 1e-6
    ft = sa.v3_scale(vt, -jnp.minimum(mu * fn_mag, 2.0 * kd * vt_norm) / vt_norm)
    return sa.v3_add(sa.v3_scale(normal, fn_mag), ft)


def _zero_fext(nb):
    return [[0.0] * 6 for _ in range(nb)]


def _add_wrench(f_ext, body, pos, force):
    torque = sa.v3_cross(pos, force)
    f_ext[body] = sa.sv6_add(f_ext[body], torque + force)
    return f_ext


def ground_contacts_s(model, R_wb, p_wb, v):
    """Scalar twin of ground_contacts → (per-body 6-lists, per-geom mags)."""
    f_ext = _zero_fext(model.nb)
    mags = []
    up = [0.0, 0.0, 1.0]
    for g in model.geoms:
        pos, vel = _point_state_s(R_wb, p_wb, v, g.body, [float(c) for c in g.offset])
        depth = g.radius - pos[2]
        force = _contact_force_s(
            depth, up, vel, model.contact_kp, model.contact_kd,
            model.friction_mu, model.contact_force_cap,
        )
        f_ext = _add_wrench(f_ext, g.body, pos, force)
        mags.append(sa.v3_norm(force))
    return f_ext, mags


def box_ground_contacts_s(model, R_wb, p_wb, v, box_body, half):
    """Scalar twin of box_ground_contacts (half: 3 python floats)."""
    f_ext = _zero_fext(model.nb)
    Rb, pb = R_wb[box_body], p_wb[box_body]
    omega, vlin = v[box_body][:3], v[box_body][3:]
    up = [0.0, 0.0, 1.0]
    for sx in (-1.0, 1.0):
        for sy in (-1.0, 1.0):
            for sz in (-1.0, 1.0):
                local = [sx * half[0], sy * half[1], sz * half[2]]
                pos = sa.v3_add(pb, sa.m33_vec(Rb, local))
                vel = sa.m33_vec(Rb, sa.v3_add(vlin, sa.v3_cross(omega, local)))
                force = _contact_force_s(
                    -pos[2], up, vel, model.contact_kp, model.contact_kd,
                    model.friction_mu, model.contact_force_cap,
                )
                f_ext = _add_wrench(f_ext, box_body, pos, force)
    return f_ext


def sphere_box_contacts_s(model, R_wb, p_wb, v, box_body, half):
    """Scalar twin of sphere_box_contacts: every model sphere vs an
    oriented box at box_body's origin; equal-and-opposite wrenches."""
    f_ext = _zero_fext(model.nb)
    Rb, pb = R_wb[box_body], p_wb[box_body]
    mags = []
    for g in model.geoms:
        if g.body == box_body:
            mags.append(jnp.zeros(()))
            continue
        pos, vel = _point_state_s(R_wb, p_wb, v, g.body, [float(c) for c in g.offset])
        rel = sa.v3_sub(pos, pb)
        local = sa.m33_T_vec(Rb, rel)
        closest = [jnp.clip(local[k], -half[k], half[k]) for k in range(3)]
        delta = sa.v3_sub(local, closest)
        dist = sa.v3_norm(delta) + 1e-9
        inside = (
            (jnp.abs(local[0]) < half[0])
            & (jnp.abs(local[1]) < half[1])
            & (jnp.abs(local[2]) < half[2])
        )
        n_out = sa.v3_scale(delta, 1.0 / dist)
        # inside: push out along the largest |local|/extent axis, matching
        # one_hot(argmax(ratios)) (first-max tie-breaking)
        r0 = jnp.abs(local[0]) / half[0]
        r1 = jnp.abs(local[1]) / half[1]
        r2 = jnp.abs(local[2]) / half[2]
        pick0 = (r0 >= r1) & (r0 >= r2)
        pick1 = jnp.logical_not(pick0) & (r1 >= r2)
        pick2 = jnp.logical_not(pick0) & jnp.logical_not(pick1)
        n_in = [
            jnp.sign(local[0]) * pick0,
            jnp.sign(local[1]) * pick1,
            jnp.sign(local[2]) * pick2,
        ]
        normal_local = [jnp.where(inside, n_in[k], n_out[k]) for k in range(3)]
        pen = jnp.minimum(
            jnp.minimum(half[0] - jnp.abs(closest[0]), half[1] - jnp.abs(closest[1])),
            half[2] - jnp.abs(closest[2]),
        )
        depth = jnp.where(inside, g.radius + pen, g.radius - dist)
        normal = sa.m33_vec(Rb, normal_local)

        box_pt_vel = sa.m33_vec(Rb, sa.v3_add(vlin_box := v[box_body][3:],
                                              sa.v3_cross(v[box_body][:3],
                                                          sa.m33_T_vec(Rb, rel))))
        rel_vel = sa.v3_sub(vel, box_pt_vel)
        force = _contact_force_s(
            depth, normal, rel_vel, model.contact_kp, model.contact_kd,
            model.friction_mu, model.contact_force_cap,
        )
        f_ext = _add_wrench(f_ext, g.body, pos, force)
        neg = sa.v3_scale(force, -1.0)
        torque = sa.v3_cross(pos, force)
        f_ext[box_body] = sa.sv6_add(
            f_ext[box_body], [-torque[0], -torque[1], -torque[2]] + neg
        )
        mags.append(sa.v3_norm(force))
    return f_ext, mags


def add_fext_s(*fs):
    """Elementwise sum of per-body 6-list force sets."""
    out = fs[0]
    for g in fs[1:]:
        out = [sa.sv6_add(a, b) for a, b in zip(out, g)]
    return out
