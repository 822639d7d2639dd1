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


# =====================================================================
# Anchored contacts (v2) — static friction + effective-mass-stable gains
#
# The plain penalty model above has two failure modes that the round-3
# AllegroHand flagship exposed (LEARNING.md; lab: scripts/contact_lab.py):
#   1. NO static friction: the tangential force is a pure viscous slope
#      capped by the Coulomb cone, so any sustained tangential load makes
#      the contact creep forever — a 0.4·µ·mg push slides the cube at
#      ~1 m/s. Grasp-and-twist (the strategy that earns the reference's
#      AllegroHand threshold, IsaacGymEnvs via ref pql/utils/common.py:
#      246-275) is impossible without stick.
#   2. UNSTABLE rocking: fixed global kd/kt gains exceed the explicit-
#      integration stability bound for the *rotational* contact mode —
#      the point effective mass of a box corner is I/r² ≈ m/5, so gains
#      sized for the translational mass pump energy and the cube
#      trampolines off a 3° tilt.
#
# Fix: per-PAIR gains derived at trace time from point effective masses
# (derive_pair), and a tangential ANCHOR spring that provides true
# stiction up to the Coulomb cone, with the anchor dragged along the
# cone surface when sliding (the standard box-friction regularization,
# cf. MuJoCo's friction model / SAP solvers). Anchors are carried in the
# env state as a flat per-env array (4 scalars per pair: anchor xyz +
# engaged flag) — see dynamics.physics_substeps(contact_state=...).
# =====================================================================

from dataclasses import dataclass  # noqa: E402

import numpy as _np  # noqa: E402


@dataclass(frozen=True)
class PairParams:
    """Per contact-pair penalty gains (python floats, trace-time consts)."""

    kp: float  # normal spring
    kd: float  # normal damping
    mu: float  # Coulomb friction coefficient
    cap: float  # normal force cap
    kpt: float  # tangential anchor spring
    kdt: float  # tangential damping (also the slip catch slope)


def point_eff_mass(model: RigidBodyModel, body: int, point_body) -> float:
    """Apparent mass of rigid `body` at a body-frame point (worst
    direction): 1/m_eff = 1/m + |ρ|²/λ_min(I). Conservative for
    articulated links (joints add mobility) — Geom.m_eff overrides."""
    m = float(model.mass[body])
    rho = _np.asarray(point_body, float) - _np.asarray(model.com[body], float)
    lam = float(_np.linalg.eigvalsh(_np.asarray(model.inertia[body], float))[0])
    return 1.0 / (1.0 / m + float(rho @ rho) / max(lam, 1e-12))


def derive_pair(
    model: RigidBodyModel,
    m_eff: float,
    n_share: int = 1,
    mu: float | None = None,
    kp: float | None = None,
) -> PairParams:
    """Stable penalty gains for a contact pair of effective mass m_eff
    shared by ~n_share simultaneous contacts on the same body.

    Explicit (symplectic-Euler) stability at substep dt: springs need
    ω·dt ≲ 1 and viscous terms need c·dt/m < 2. The normal spring keeps
    the model's kp (clamped to the spring bound); damping and friction
    gains are derived per pair and clamped to the viscous bound. The
    anchor spring gives stiction compliance µ·fn/kpt (sub-mm at these
    scales) instead of the unbounded creep of a viscous-only model."""
    dt = model.dt
    m_s = max(m_eff / max(n_share, 1), 1e-9)
    kp_v = float(model.contact_kp if kp is None else kp)
    kp_v = min(kp_v, 0.9 * m_s / dt**2)  # ω·dt ≤ ~0.95
    kpt = min(kp_v, 0.8 * m_s / dt**2)
    visc_bound = 0.7 * m_s / dt  # < 2·m/dt with margin for force coupling
    kd = min(2.0 * model.contact_zeta * float(_np.sqrt(kp_v * m_s)), visc_bound)
    kdt = visc_bound
    return PairParams(
        kp=kp_v,
        kd=kd,
        mu=float(model.friction_mu if mu is None else mu),
        cap=float(model.contact_force_cap),
        kpt=kpt,
        kdt=kdt,
    )


def _anchored_force_s(depth, normal, vel, dx, engaged, pp: PairParams):
    """Anchored contact force in a single frame (world or box-local).

    depth > 0 penetrating; vel = relative velocity of the tracked point;
    dx = tracked point − anchor; engaged = 0/1 was-in-contact flag.
    Returns (force v3, dx_t' v3 so that anchor' = point − dx_t', engaged').
    """
    active = jnp.where(depth > 0.0, 1.0, 0.0)
    vn = sa.v3_dot(vel, normal)
    fn = jnp.clip(pp.kp * depth - pp.kd * vn, 0.0, pp.cap) * active
    vt = sa.v3_sub(vel, sa.v3_scale(normal, vn))
    dxn = sa.v3_dot(dx, normal)
    dxt = sa.v3_sub(dx, sa.v3_scale(normal, dxn))
    eng = active * engaged
    ft_raw = [-(pp.kpt * dxt[k] * eng + pp.kdt * vt[k] * active) for k in range(3)]
    ftn = sa.v3_norm(ft_raw) + 1e-9
    scale = jnp.minimum(1.0, pp.mu * fn / ftn)
    ft = [ft_raw[k] * scale for k in range(3)]
    # anchor update: sliding (scale<1) drags the anchor to the cone
    # surface (spring alone would reproduce the clamped force next step);
    # first touch snaps the anchor to the point; inactive follows it.
    slid = [
        jnp.where(scale < 1.0, -(ft[k] + pp.kdt * vt[k] * active) / pp.kpt, dxt[k])
        for k in range(3)
    ]
    dxt_new = [slid[k] * eng for k in range(3)]
    force = [sa.sadd(sa.smul(fn, normal[k]), ft[k]) for k in range(3)]
    return force, dxt_new, active


def _cs_unpack(cs, idx):
    """4 scalars per pair from the flat contact-state list."""
    b = 4 * idx
    return [cs[b], cs[b + 1], cs[b + 2]], cs[b + 3]


def _cs_pack(out, idx, anchor, engaged):
    b = 4 * idx
    out[b], out[b + 1], out[b + 2] = anchor[0], anchor[1], anchor[2]
    out[b + 3] = engaged


def ground_anchored_s(model, R_wb, p_wb, v, cs, cs_new, base_idx, pps):
    """Sphere-vs-ground with tangential anchors (world frame). Reads pairs
    [base_idx, base_idx+len(geoms)) of the flat contact state `cs`, writes
    updates into `cs_new` (a mutable list). Returns ([nb,6]-lists f_ext,
    next free pair index)."""
    f_ext = _zero_fext(model.nb)
    up = [0.0, 0.0, 1.0]
    for j, (g, pp) in enumerate(zip(model.geoms, pps)):
        pos, vel = _point_state_s(R_wb, p_wb, v, g.body, [float(c) for c in g.offset])
        anchor, engaged = _cs_unpack(cs, base_idx + j)
        depth = g.radius - pos[2]
        dx = sa.v3_sub(pos, anchor)
        force, dxt_new, eng_new = _anchored_force_s(depth, up, vel, dx, engaged, pp)
        f_ext = _add_wrench(f_ext, g.body, pos, force)
        _cs_pack(cs_new, base_idx + j, sa.v3_sub(pos, dxt_new), eng_new)
    return f_ext, base_idx + len(model.geoms)


def sphere_box_anchored_s(model, R_wb, p_wb, v, box_body, half, cs, cs_new, base_idx, pps):
    """Every model sphere vs an oriented box at `box_body`, with anchors
    stored in the BOX frame (so stick is correct while the box rotates —
    exactly the in-hand reorientation case). Equal-and-opposite wrenches."""
    f_ext = _zero_fext(model.nb)
    Rb, pb = R_wb[box_body], p_wb[box_body]
    vlin_box = v[box_body][3:]
    omega_box = v[box_body][:3]
    for j, (g, pp) in enumerate(zip(model.geoms, pps)):
        if g.body == box_body:
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

        # relative velocity of the sphere center w.r.t. the box surface
        # point, expressed in the box frame
        box_pt_vel = sa.m33_vec(
            Rb, sa.v3_add(vlin_box, sa.v3_cross(omega_box, local))
        )
        rel_vel_local = sa.m33_T_vec(Rb, sa.v3_sub(vel, box_pt_vel))

        anchor, engaged = _cs_unpack(cs, base_idx + j)  # box-frame anchor
        dx = sa.v3_sub(local, anchor)
        force_l, dxt_new, eng_new = _anchored_force_s(
            depth, normal_local, rel_vel_local, dx, engaged, pp
        )
        force = sa.m33_vec(Rb, force_l)
        f_ext = _add_wrench(f_ext, g.body, pos, force)
        neg = sa.v3_scale(force, -1.0)
        torque = sa.v3_cross(pos, force)
        f_ext[box_body] = sa.sv6_add(
            f_ext[box_body], [-torque[0], -torque[1], -torque[2]] + neg
        )
        _cs_pack(cs_new, base_idx + j, sa.v3_sub(local, dxt_new), eng_new)
    return f_ext, base_idx + len(model.geoms)


_CORNER_SIGNS = [
    (sx, sy, sz) for sx in (-1.0, 1.0) for sy in (-1.0, 1.0) for sz in (-1.0, 1.0)
]


def box_ground_anchored_s(model, R_wb, p_wb, v, box_body, half, cs, cs_new, base_idx, pp):
    """Oriented-box corners vs the ground plane with per-corner anchors
    (world frame). One PairParams shared by the 8 corners."""
    f_ext = _zero_fext(model.nb)
    Rb, pb = R_wb[box_body], p_wb[box_body]
    omega, vlin = v[box_body][:3], v[box_body][3:]
    up = [0.0, 0.0, 1.0]
    for j, (sx, sy, sz) in enumerate(_CORNER_SIGNS):
        local = [sx * half[0], sy * half[1], sz * half[2]]
        pos = sa.v3_add(pb, sa.m33_vec(Rb, local))
        vel = sa.m33_vec(Rb, sa.v3_add(vlin, sa.v3_cross(omega, local)))
        anchor, engaged = _cs_unpack(cs, base_idx + j)
        dx = sa.v3_sub(pos, anchor)
        force, dxt_new, eng_new = _anchored_force_s(-pos[2], up, vel, dx, engaged, pp)
        f_ext = _add_wrench(f_ext, box_body, pos, force)
        _cs_pack(cs_new, base_idx + j, sa.v3_sub(pos, dxt_new), eng_new)
    return f_ext, base_idx + 8


# =====================================================================
# Pair-VECTORIZED anchored contacts (round 5)
#
# The per-pair scalar loops above trace ~250 jaxpr eqns per contact pair;
# at AllegroHand scale (40 pairs x 8 substeps) the contact section alone
# was ~8.6k eqns of the 21k-eqn substep body, and XLA compile time —
# not runtime — had become the binding constraint of the whole system
# (cold hand compiles blew the bench leash and the driver's
# dryrun_multichip budget; VERDICT r4 items 1-3).
#
# Fix: batch each homogeneous pair GROUP (all spheres vs ground, all
# spheres vs the cube, all 8 cube corners vs ground) as [n]-array math.
# The scalar-algebra helpers are shape-polymorphic, so the SAME
# `_anchored_force_s` core runs on v3s whose components are [n] arrays;
# per-pair gains become numpy [n] arrays inside a PairParams. Semantics
# are identical to the scalar loops (parity-tested in
# tests/test_contact_anchored.py). Result: the whole contact section is
# a few hundred eqns regardless of pair count.
# =====================================================================


def stack_pair_params(pps) -> PairParams:
    """Stack per-pair PairParams into one PairParams of [n] numpy arrays."""
    f = lambda name: _np.asarray([getattr(p, name) for p in pps], _np.float32)
    return PairParams(
        kp=f("kp"), kd=f("kd"), mu=f("mu"), cap=f("cap"), kpt=f("kpt"), kdt=f("kdt")
    )


def _stackn(xs, ref):
    """Stack scalars into an [n] array, broadcasting python-float
    constants against a traced reference scalar."""
    xs = [x if not isinstance(x, (int, float)) else jnp.zeros_like(ref) + x for x in xs]
    return jnp.stack(xs)


def _gather_points(R_wb, p_wb, v, bodies, offsets):
    """World position/velocity of body-frame points, as v3s of [n] arrays.

    offsets: [n,3] numpy constants. Vectorized twin of _point_state_s."""
    ref = p_wb[bodies[0]][2]
    R = [[_stackn([R_wb[b][r][c] for b in bodies], ref) for c in range(3)] for r in range(3)]
    p = [_stackn([p_wb[b][k] for b in bodies], ref) for k in range(3)]
    w = [_stackn([v[b][k] for b in bodies], ref) for k in range(3)]
    vl = [_stackn([v[b][3 + k] for b in bodies], ref) for k in range(3)]
    off = [offsets[:, k] for k in range(3)]
    pos = sa.v3_add(p, sa.m33_vec(R, off))
    vel = sa.m33_vec(R, sa.v3_add(vl, sa.v3_cross(w, off)))
    return pos, vel, ref


def _gather_anchors(cs, base_idx, idxs, ref):
    """Anchor v3 + engaged flag as [n] arrays from the flat contact state."""
    anchor = [
        _stackn([cs[4 * (base_idx + j) + k] for j in idxs], ref) for k in range(3)
    ]
    engaged = _stackn([cs[4 * (base_idx + j) + 3] for j in idxs], ref)
    return anchor, engaged


def _scatter_anchors(cs_new, base_idx, idxs, anchor, engaged):
    for jj, j in enumerate(idxs):
        _cs_pack(
            cs_new,
            base_idx + j,
            [anchor[0][jj], anchor[1][jj], anchor[2][jj]],
            engaged[jj],
        )


def _scatter_wrenches(f_ext, bodies, pos, force):
    """f_ext[body] += [pos x force; force] per pair (distinct bodies)."""
    torque = sa.v3_cross(pos, force)
    for jj, b in enumerate(bodies):
        f_ext[b] = sa.sv6_add(
            f_ext[b],
            [torque[0][jj], torque[1][jj], torque[2][jj],
             force[0][jj], force[1][jj], force[2][jj]],
        )
    return torque


def ground_anchored_v(model, R_wb, p_wb, v, cs, cs_new, base_idx, pps):
    """Vectorized twin of ground_anchored_s (all sphere geoms at once)."""
    geoms = model.geoms
    n = len(geoms)
    bodies = [g.body for g in geoms]
    offsets = _np.asarray([g.offset for g in geoms], _np.float32)
    pos, vel, ref = _gather_points(R_wb, p_wb, v, bodies, offsets)
    anchor, engaged = _gather_anchors(cs, base_idx, range(n), ref)
    pp = stack_pair_params(pps)
    radius = _np.asarray([g.radius for g in geoms], _np.float32)
    depth = radius - pos[2]
    dx = sa.v3_sub(pos, anchor)
    force, dxt_new, eng_new = _anchored_force_s(
        depth, [0.0, 0.0, 1.0], vel, dx, engaged, pp
    )
    f_ext = _zero_fext(model.nb)
    _scatter_wrenches(f_ext, bodies, pos, force)
    _scatter_anchors(cs_new, base_idx, range(n), sa.v3_sub(pos, dxt_new), eng_new)
    return f_ext, base_idx + n


def sphere_box_anchored_v(
    model, R_wb, p_wb, v, box_body, half, cs, cs_new, base_idx, pps
):
    """Vectorized twin of sphere_box_anchored_s: all spheres vs one
    oriented box, box-frame anchors, equal-and-opposite wrenches."""
    geoms = model.geoms
    idxs = [j for j, g in enumerate(geoms) if g.body != box_body]
    bodies = [geoms[j].body for j in idxs]
    offsets = _np.asarray([geoms[j].offset for j in idxs], _np.float32)
    radius = _np.asarray([geoms[j].radius for j in idxs], _np.float32)
    pos, vel, ref = _gather_points(R_wb, p_wb, v, bodies, offsets)
    pp = stack_pair_params([pps[j] for j in idxs])

    Rb, pb = R_wb[box_body], p_wb[box_body]
    vlin_box, omega_box = v[box_body][3:], v[box_body][:3]
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
    depth = jnp.where(inside, radius + pen, radius - dist)

    box_pt_vel = sa.m33_vec(Rb, sa.v3_add(vlin_box, sa.v3_cross(omega_box, local)))
    rel_vel_local = sa.m33_T_vec(Rb, sa.v3_sub(vel, box_pt_vel))

    anchor, engaged = _gather_anchors(cs, base_idx, idxs, ref)
    dx = sa.v3_sub(local, anchor)
    force_l, dxt_new, eng_new = _anchored_force_s(
        depth, normal_local, rel_vel_local, dx, engaged, pp
    )
    force = sa.m33_vec(Rb, force_l)
    f_ext = _zero_fext(model.nb)
    torque = _scatter_wrenches(f_ext, bodies, pos, force)
    # equal-and-opposite on the box: -sum over pairs
    f_ext[box_body] = sa.sv6_add(
        f_ext[box_body],
        [-jnp.sum(torque[k]) for k in range(3)] + [-jnp.sum(force[k]) for k in range(3)],
    )
    _scatter_anchors(cs_new, base_idx, idxs, sa.v3_sub(local, dxt_new), eng_new)
    return f_ext, base_idx + len(geoms)


def box_ground_anchored_v(
    model, R_wb, p_wb, v, box_body, half, cs, cs_new, base_idx, pp
):
    """Vectorized twin of box_ground_anchored_s (8 corners at once).
    One scalar PairParams shared by the corners (broadcasts)."""
    Rb, pb = R_wb[box_body], p_wb[box_body]
    omega, vlin = v[box_body][:3], v[box_body][3:]
    signs = _np.asarray(_CORNER_SIGNS, _np.float32)
    local = [signs[:, k] * half[k] for k in range(3)]
    pos = sa.v3_add(pb, sa.m33_vec(Rb, local))
    vel = sa.m33_vec(Rb, sa.v3_add(vlin, sa.v3_cross(omega, local)))
    ref = pos[2]
    anchor, engaged = _gather_anchors(cs, base_idx, range(8), ref)
    dx = sa.v3_sub(pos, anchor)
    force, dxt_new, eng_new = _anchored_force_s(
        -pos[2], [0.0, 0.0, 1.0], vel, dx, engaged, pp
    )
    torque = sa.v3_cross(pos, force)
    f_ext = _zero_fext(model.nb)
    f_ext[box_body] = sa.sv6_add(
        f_ext[box_body],
        [jnp.sum(torque[k]) for k in range(3)] + [jnp.sum(force[k]) for k in range(3)],
    )
    _scatter_anchors(cs_new, base_idx, range(8), sa.v3_sub(pos, dxt_new), eng_new)
    return f_ext, base_idx + 8


def bowl_anchored_v(
    model, R_wb, p_wb, v, box_body, half, center, radius, cs, cs_new, base_idx, pp
):
    """Oriented-box corners vs the INSIDE of a spherical bowl (anchored
    friction, world-frame anchors) — the cradled-palm geometry of the
    reference task: IGE's palm-up AllegroHand supports the cube in a
    concavity, so fingertips can ROLL it continuously instead of needing
    stick-twist-release gaits on a flat plane (round-5 flagship
    diagnosis, LEARNING.md). Bowl: center [3] and radius (python
    floats); a corner at distance d from the center penetrates the shell
    by (d - radius), with the surface normal pointing back toward the
    center. Same pair-state layout as box_ground_anchored_v (8 pairs)."""
    Rb, pb = R_wb[box_body], p_wb[box_body]
    omega, vlin = v[box_body][:3], v[box_body][3:]
    signs = _np.asarray(_CORNER_SIGNS, _np.float32)
    local = [signs[:, k] * half[k] for k in range(3)]
    pos = sa.v3_add(pb, sa.m33_vec(Rb, local))
    vel = sa.m33_vec(Rb, sa.v3_add(vlin, sa.v3_cross(omega, local)))
    rel = [sa.ssub(pos[k], float(center[k])) for k in range(3)]
    d = sa.v3_norm(rel) + 1e-9
    depth_bowl = d - float(radius)
    n_bowl = sa.v3_scale(rel, -1.0 / d)
    # inside the rim (where the shell meets z=0) the shell is the
    # support; outside, fall back to the plane — otherwise the "bowl"
    # would act as an infinite arena shell pulling far-away cubes back
    r_rim2 = float(radius) ** 2 - float(center[2]) ** 2
    in_rim = (pos[0] * pos[0] + pos[1] * pos[1]) < r_rim2
    depth = jnp.where(in_rim, depth_bowl, -pos[2])
    normal = [
        jnp.where(in_rim, n_bowl[0], 0.0),
        jnp.where(in_rim, n_bowl[1], 0.0),
        jnp.where(in_rim, n_bowl[2], 1.0),
    ]
    ref = pos[2]
    anchor, engaged = _gather_anchors(cs, base_idx, range(8), ref)
    dx = sa.v3_sub(pos, anchor)
    force, dxt_new, eng_new = _anchored_force_s(depth, normal, vel, dx, engaged, pp)
    torque = sa.v3_cross(pos, force)
    f_ext = _zero_fext(model.nb)
    f_ext[box_body] = sa.sv6_add(
        f_ext[box_body],
        [jnp.sum(torque[k]) for k in range(3)] + [jnp.sum(force[k]) for k in range(3)],
    )
    _scatter_anchors(cs_new, base_idx, range(8), sa.v3_sub(pos, dxt_new), eng_new)
    return f_ext, base_idx + 8
