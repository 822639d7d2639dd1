"""Articulated rigid-body forward dynamics (CRBA + RNEA).

The TPU-native replacement for the reference's PhysX simulation layer:
single-env dynamics written as pure jnp on static shapes, vmapped over
thousands of envs and jit-fused with the RL update. nv is small (Ant: 14),
so the joint-space approach — mass matrix via the Composite Rigid Body
Algorithm, bias forces via the Recursive Newton-Euler Algorithm, one dense
solve — is both simple and fast: body loops unroll at trace time and XLA
batches the tiny solves across the env axis.

Conventions per Featherstone (see pql_tpu.physics.spatial). Gravity enters
RNEA through a fictitious base acceleration; contacts enter as world-frame
spatial forces per body (see pql_tpu.physics.contact).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pql_tpu.physics import scalar_algebra as sa
from pql_tpu.physics import spatial as sp
from pql_tpu.physics.model import FREE, HINGE, RigidBodyModel


def fwd_kinematics(model: RigidBodyModel, q: jax.Array):
    """World poses + joint transforms.

    Returns (R_wb [nb,3,3], p_wb [nb,3], Xup: list of 6×6 ^i X_parent,
    S: list of [6, nv_i] motion subspaces).
    """
    R_wb, p_wb, Xup, S = [], [], [], []
    for i in range(model.nb):
        qs = model.q_start[i]
        par = model.parent[i]
        if model.joint_type[i] == FREE:
            pos = q[qs : qs + 3]
            quat = q[qs + 3 : qs + 7]
            R = sp.quat_to_mat(quat)
            R_wb.append(R)
            p_wb.append(pos)
            Xup.append(sp.xmat(R.T, pos))  # parent is world
            S.append(jnp.eye(6))
        else:
            theta = q[qs]
            axis = jnp.asarray(model.joint_axis[i])
            Rj = sp.axis_angle_to_mat(axis, theta)  # child→parent rotation
            tp = jnp.asarray(model.tree_pos[i])
            Rp = R_wb[par] if par >= 0 else jnp.eye(3)
            pp = p_wb[par] if par >= 0 else jnp.zeros(3)
            R = Rp @ Rj
            p = pp + Rp @ tp
            R_wb.append(R)
            p_wb.append(p)
            # ^i X_parent = rot(Rj^T) · xlt(tree_pos)
            Xup.append(sp.xmat(Rj.T, tp))
            S.append(jnp.concatenate([axis, jnp.zeros(3)])[:, None])
    return jnp.stack(R_wb), jnp.stack(p_wb), Xup, S


def body_velocities(model: RigidBodyModel, Xup, S, qd):
    """Body-frame spatial velocities v_i = ^i X_p v_p + S_i q̇_i."""
    v = []
    for i in range(model.nb):
        vs, nvi = model.v_start[i], model.nv_per_joint[i]
        vj = S[i] @ qd[vs : vs + nvi]
        par = model.parent[i]
        v.append(vj if par < 0 else Xup[i] @ v[par] + vj)
    return v


def mass_matrix(model: RigidBodyModel, Xup, S):
    """CRBA; armature added on the diagonal."""
    Ic = [
        sp.spatial_inertia(
            jnp.asarray(model.mass[i]),
            jnp.asarray(model.com[i]),
            jnp.asarray(model.inertia[i]),
        )
        for i in range(model.nb)
    ]
    for i in reversed(range(model.nb)):
        par = model.parent[i]
        if par >= 0:
            Ic[par] = Ic[par] + Xup[i].T @ Ic[i] @ Xup[i]

    M = jnp.zeros((model.nv, model.nv))
    for i in range(model.nb):
        vi, nvi = model.v_start[i], model.nv_per_joint[i]
        F = Ic[i] @ S[i]  # [6, nvi]
        M = M.at[vi : vi + nvi, vi : vi + nvi].set(S[i].T @ F)
        j = i
        while model.parent[j] >= 0:
            F = Xup[j].T @ F
            j = model.parent[j]
            vj, nvj = model.v_start[j], model.nv_per_joint[j]
            blk = S[j].T @ F  # [nvj, nvi]
            M = M.at[vj : vj + nvj, vi : vi + nvi].set(blk)
            M = M.at[vi : vi + nvi, vj : vj + nvj].set(blk.T)
    return M + jnp.diag(jnp.asarray(model.armature))


def bias_forces(
    model: RigidBodyModel, Xup, S, v, qd, f_ext_world, R_wb, p_wb
):
    """RNEA with q̈ = 0: Coriolis/centrifugal + gravity − external forces,
    plus joint damping. f_ext_world: [nb, 6] spatial forces about the world
    origin, world coords."""
    # gravity as fictitious base acceleration (RBDA §5.3)
    a_base = jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, -model.gravity])
    a, f = [], []
    for i in range(model.nb):
        vs, nvi = model.v_start[i], model.nv_per_joint[i]
        vj = S[i] @ qd[vs : vs + nvi]
        par = model.parent[i]
        a_par = Xup[i] @ (a_base if par < 0 else a[par])
        a.append(a_par + sp.crm(v[i]) @ vj)
        Ii = sp.spatial_inertia(
            jnp.asarray(model.mass[i]),
            jnp.asarray(model.com[i]),
            jnp.asarray(model.inertia[i]),
        )
        fi = Ii @ a[i] + sp.crf(v[i]) @ (Ii @ v[i])
        # external force: world-origin coords → body coords via ^i X*_0
        fi = fi - sp.xmat_force(R_wb[i].T, p_wb[i]) @ f_ext_world[i]
        f.append(fi)

    C = jnp.zeros(model.nv)
    for i in reversed(range(model.nb)):
        vs, nvi = model.v_start[i], model.nv_per_joint[i]
        C = C.at[vs : vs + nvi].set(S[i].T @ f[i])
        par = model.parent[i]
        if par >= 0:
            f[par] = f[par] + Xup[i].T @ f[i]

    # joint damping + hinge limit springs in joint space
    C = C + jnp.asarray(model.damping) * qd
    return C


def _limit_torque(model: RigidBodyModel, q: jax.Array) -> jax.Array:
    """Soft joint-limit restoring torque for hinge dofs."""
    tau = jnp.zeros(model.nv)
    for i in range(model.nb):
        if model.joint_type[i] != HINGE:
            continue
        qs, vs = model.q_start[i], model.v_start[i]
        lo = model.limit_lo[vs]
        hi = model.limit_hi[vs]
        over = jnp.maximum(q[qs] - hi, 0.0) + jnp.minimum(q[qs] - lo, 0.0)
        tau = tau.at[vs].set(-model.limit_stiffness * over)
    return tau


def actuation(
    model: RigidBodyModel, action: jax.Array, q: jax.Array | None = None,
    qd: jax.Array | None = None,
) -> jax.Array:
    """Map [-1,1]^nu policy actions to joint torques.

    Matrix-path reference for the scalar ``_tau_s``: torque mode scales
    by gear; position mode (IGE DOF_MODE_POS) runs the PD servo with
    gear as the effort cap (pass q, qd)."""
    tau = jnp.zeros(model.nv)
    gear = jnp.asarray(model.gear)
    if model.control_mode == "position":
        for k, dof in enumerate(model.actuated_dofs):
            lo, hi = float(model.limit_lo[dof]), float(model.limit_hi[dof])
            mid, half = 0.5 * (lo + hi), 0.5 * (hi - lo)
            target = mid + half * jnp.clip(action[k], -1.0, 1.0)
            pd = model.act_kp * (target - q[model.q_of_dof[dof]]) - model.act_kd * qd[dof]
            tau = tau.at[dof].set(jnp.clip(pd, -gear[k], gear[k]))
        return tau
    for k, dof in enumerate(model.actuated_dofs):
        tau = tau.at[dof].set(gear[k] * jnp.clip(action[k], -1.0, 1.0))
    return tau


def spd_solve(M: jax.Array, b: jax.Array) -> jax.Array:
    """Solve M x = b for SPD M via an UNROLLED Cholesky factorization.

    nv is small and static (≤ ~22), so the factorization unrolls at trace
    time into pure scalar/vector jnp ops. This matters on TPU:
    ``jnp.linalg.solve`` lowers to a batched LU that degrades
    catastrophically inside ``shard_map`` (measured 124 ms vs 0.08 ms for
    the whole Ant step at 4096 envs — the solve serializes); the unrolled
    form vmaps and shard_maps as ordinary elementwise math. M is SPD by
    construction (CRBA mass matrix + armature diagonal).
    """
    n = M.shape[-1]
    # Cholesky: L (lower) with M = L Lᵀ, unrolled over static indices
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        s = M[..., i, i]
        for k in range(i):
            s = s - L[i][k] * L[i][k]
        L[i][i] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv = 1.0 / L[i][i]
        for j in range(i + 1, n):
            s = M[..., j, i]
            for k in range(i):
                s = s - L[j][k] * L[i][k]
            L[j][i] = s * inv
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution Lᵀ x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


# =====================================================================
# Scalar-unrolled hot path
#
# The matrix functions above are the readable reference implementation
# (kept for tests and one-shot obs construction). The training hot path
# uses the scalar-unrolled core below: every small matrix/vector is a
# nested Python list of per-env scalars (pql_tpu.physics.scalar_algebra).
# Under vmap each scalar is a [B]-vector, so no [B,3,3]/[B,6,6]
# intermediates ever materialize — on TPU those get padded to the
# 128-lane minor dimension (~21x bytes for a 6-wide axis) and were
# profiled at ~1.8 ms/iter of pure bandwidth waste inside the fused PQL
# step. The scalar form also computes kinematics ONCE per substep for
# both contacts and dynamics (the matrix path recomputed it).
# =====================================================================


def _kin_s(model: RigidBodyModel, q):
    """Scalar kinematics. Returns (R_wb, p_wb, Xup, S_axis): per-body
    rotation m33 / position v3 lists, factored transforms (E, r), and the
    hinge axis (python floats) or None for a free joint."""
    R_wb, p_wb, Xup, S_axis = [], [], [], []
    for i in range(model.nb):
        qs, par = model.q_start[i], model.parent[i]
        if model.joint_type[i] == FREE:
            pos = [q[qs], q[qs + 1], q[qs + 2]]
            quat = [q[qs + 3], q[qs + 4], q[qs + 5], q[qs + 6]]
            R = sa.quat_to_m33(quat)
            R_wb.append(R)
            p_wb.append(pos)
            Xup.append((sa.m33_T(R), pos))  # parent is world
            S_axis.append(None)
        else:
            theta = q[qs]
            axis = [float(a) for a in model.joint_axis[i]]
            Rj = sa.axis_angle_to_m33(axis, theta)
            tp = [float(c) for c in model.tree_pos[i]]
            Rp = R_wb[par] if par >= 0 else sa.m33_eye()
            pp = p_wb[par] if par >= 0 else sa.v3_zero()
            R_wb.append(sa.m33_mul(Rp, Rj))
            p_wb.append(sa.v3_add(pp, sa.m33_vec(Rp, tp)))
            Xup.append((sa.m33_T(Rj), tp))
            S_axis.append(axis)
    return R_wb, p_wb, Xup, S_axis


def _vel_s(model: RigidBodyModel, Xup, S_axis, qd):
    """Body-frame spatial velocities as 6-lists (body_velocities)."""
    v = []
    for i in range(model.nb):
        vs, par = model.v_start[i], model.parent[i]
        if S_axis[i] is None:
            vj = [qd[vs + k] for k in range(6)]
        else:
            a, w = S_axis[i], qd[vs]
            vj = [sa.smul(a[0], w), sa.smul(a[1], w), sa.smul(a[2], w), 0.0, 0.0, 0.0]
        v.append(vj if par < 0 else sa.sv6_add(sa.x_motion(Xup[i], v[par]), vj))
    return v


def _const_inertias(model: RigidBodyModel):
    """Per-body 6×6 spatial inertias as nested PYTHON FLOAT lists —
    constant-folded at trace time."""
    return [
        sa.spatial_inertia_s(
            float(model.mass[i]),
            [float(c) for c in model.com[i]],
            [[float(model.inertia[i][r][c]) for c in range(3)] for r in range(3)],
        )
        for i in range(model.nb)
    ]


def _mass_matrix_s(model: RigidBodyModel, Xup, S_axis):
    """CRBA on scalars; armature on the diagonal (mass_matrix)."""
    Ic = _const_inertias(model)
    for i in reversed(range(model.nb)):
        par = model.parent[i]
        if par >= 0:
            Ic[par] = sa.m66_add(Ic[par], sa.x_T_I_x(Xup[i], Ic[i]))
    nv = model.nv
    M = [[0.0] * nv for _ in range(nv)]
    for i in range(model.nb):
        vi = model.v_start[i]
        if S_axis[i] is None:
            # S = identity: F = Ic columns; M block = Ic itself
            F = [[Ic[i][r][c] for r in range(6)] for c in range(6)]
            for r in range(6):
                for c in range(6):
                    M[vi + r][vi + c] = Ic[i][r][c]
        else:
            a = S_axis[i]
            col = sa.m66_vec(Ic[i], [a[0], a[1], a[2], 0.0, 0.0, 0.0])
            F = [col]
            M[vi][vi] = sa.v3_dot(a, col[:3])
        j = i
        while model.parent[j] >= 0:
            F = [sa.x_motion_T(Xup[j], col) for col in F]
            j = model.parent[j]
            vj = model.v_start[j]
            if S_axis[j] is None:
                for c, col in enumerate(F):
                    for r in range(6):
                        M[vj + r][vi + c] = col[r]
                        M[vi + c][vj + r] = col[r]
            else:
                aj = S_axis[j]
                for c, col in enumerate(F):
                    val = sa.v3_dot(aj, col[:3])
                    M[vj][vi + c] = val
                    M[vi + c][vj] = val
    for d in range(nv):
        M[d][d] = M[d][d] + float(model.armature[d])
    return M


def _bias_forces_s(model, Xup, S_axis, v, qd, f_ext_s, R_wb, p_wb):
    """RNEA with q̈=0 on scalars (bias_forces). f_ext_s: per-body 6-lists
    of world-frame spatial forces about the world origin, or None."""
    Ic = _const_inertias(model)
    a_base = [0.0, 0.0, 0.0, 0.0, 0.0, -model.gravity]
    a, f = [], []
    for i in range(model.nb):
        vs, par = model.v_start[i], model.parent[i]
        if S_axis[i] is None:
            vj = [qd[vs + k] for k in range(6)]
        else:
            ax, w = S_axis[i], qd[vs]
            vj = [sa.smul(ax[0], w), sa.smul(ax[1], w), sa.smul(ax[2], w), 0.0, 0.0, 0.0]
        a_par = sa.x_motion(Xup[i], a_base if par < 0 else a[par])
        a.append(sa.sv6_add(a_par, sa.crm_motion(v[i], vj)))
        Iv = sa.m66_vec(Ic[i], v[i])
        Ia = sa.m66_vec(Ic[i], a[i])
        fi = sa.sv6_add(Ia, sa.crf_force(v[i], Iv))
        if f_ext_s is not None:
            fi = sa.sv6_sub(fi, sa.x_force_inv_T(R_wb[i], p_wb[i], f_ext_s[i]))
        f.append(fi)

    C = [0.0] * model.nv
    for i in reversed(range(model.nb)):
        vs, par = model.v_start[i], model.parent[i]
        if S_axis[i] is None:
            for k in range(6):
                C[vs + k] = f[i][k]
        else:
            ax = S_axis[i]
            C[vs] = sa.v3_dot(ax, f[i][:3])
        if par >= 0:
            f[par] = sa.sv6_add(f[par], sa.x_motion_T(Xup[i], f[i]))
    for d in range(model.nv):
        C[d] = sa.sadd(C[d], sa.smul(float(model.damping[d]), qd[d]))
    return C


def _tau_s(model: RigidBodyModel, q, action, qd=None):
    """Actuation + soft hinge-limit torques (actuation, _limit_torque).

    control_mode="torque": tau = gear * action (locomotion default).
    control_mode="position": per-substep PD servo — IGE's joint-position
    drive (DOF_MODE_POS; the AllegroHand reference task trains with
    stiffness 3, damping 0.1): target = limit midpoint + action * half
    range, tau = clip(kp*(target - q) - kd*qd, ±gear). Because this runs
    INSIDE the substep loop on the current (q, qd), the servo is stable
    at the physics rate, exactly like the engine-side PD in Isaac Gym."""
    tau = [0.0] * model.nv
    if model.control_mode == "position":
        for k, dof in enumerate(model.actuated_dofs):
            lo, hi = float(model.limit_lo[dof]), float(model.limit_hi[dof])
            mid, half = 0.5 * (lo + hi), 0.5 * (hi - lo)
            # hinge dofs: q index == v index offset by the free-joint gap;
            # actuated dofs are hinges, whose q slot is model.q_of_dof
            qs = model.q_of_dof[dof]
            target = mid + half * jnp.clip(action[k], -1.0, 1.0)
            pd = model.act_kp * (target - q[qs]) - model.act_kd * (
                qd[dof] if qd is not None else 0.0
            )
            tau[dof] = jnp.clip(pd, -float(model.gear[k]), float(model.gear[k]))
    else:
        for k, dof in enumerate(model.actuated_dofs):
            tau[dof] = float(model.gear[k]) * jnp.clip(action[k], -1.0, 1.0)
    for i in range(model.nb):
        if model.joint_type[i] != HINGE:
            continue
        qs, vs = model.q_start[i], model.v_start[i]
        lo, hi = float(model.limit_lo[vs]), float(model.limit_hi[vs])
        over = jnp.maximum(q[qs] - hi, 0.0) + jnp.minimum(q[qs] - lo, 0.0)
        tau[vs] = tau[vs] - model.limit_stiffness * over
    return tau


def _ssqrt(x):
    """sqrt(max(x, 1e-12)) keeping python-float constants constant."""
    if isinstance(x, (int, float)):
        import math

        return math.sqrt(max(float(x), 1e-12))
    return jnp.sqrt(jnp.maximum(x, 1e-12))


def _spd_solve_s(M, b):
    """Unrolled Cholesky solve on nested scalar lists (see spd_solve).

    Arithmetic routes through the fold-aware scalar ops, so the solve
    AUTO-SPARSIFIES: structurally-zero M entries (python 0.0 — e.g. the
    hand's cross-finger blocks, since independent chains don't couple
    through the mass matrix) produce zero L entries and NO ops, and
    all-constant blocks (the free cube's spatial inertia) constant-fold
    entirely at trace time. This cut the AllegroHand solve from ~4.8k
    jaxpr eqns to a few hundred (XLA compile time was the binding
    constraint — VERDICT r4 item 3)."""
    n = len(b)
    L = [[0.0] * n for _ in range(n)]
    inv_d = [0.0] * n
    for i in range(n):
        s = M[i][i]
        for k in range(i):
            s = sa.ssub(s, sa.smul(L[i][k], L[i][k]))
        L[i][i] = _ssqrt(s)
        inv_d[i] = 1.0 / L[i][i]
        for j in range(i + 1, n):
            s = M[j][i]
            for k in range(i):
                s = sa.ssub(s, sa.smul(L[j][k], L[i][k]))
            L[j][i] = sa.smul(s, inv_d[i])
    y = [0.0] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = sa.ssub(s, sa.smul(L[i][k], y[k]))
        y[i] = sa.smul(s, inv_d[i])
    x = [0.0] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = sa.ssub(s, sa.smul(L[k][i], x[k]))
        x[i] = sa.smul(s, inv_d[i])
    return x


def _integrate_parts(model: RigidBodyModel, q, qd, qdd):
    """Semi-implicit Euler on scalars → (q' list[nq], qd' list[nv])."""
    cap = model.max_dof_speed
    qd_new = [
        jnp.clip(qd[d] + model.dt * qdd[d], -cap, cap) for d in range(model.nv)
    ]
    q_out = [None] * model.nq
    for i in range(model.nb):
        qs, vs = model.q_start[i], model.v_start[i]
        if model.joint_type[i] == FREE:
            quat = [q[qs + 3], q[qs + 4], q[qs + 5], q[qs + 6]]
            Rb = sa.quat_to_m33(quat)
            omega = [qd_new[vs], qd_new[vs + 1], qd_new[vs + 2]]
            vlin = [qd_new[vs + 3], qd_new[vs + 4], qd_new[vs + 5]]
            dp = sa.m33_vec(Rb, vlin)
            for k in range(3):
                q_out[qs + k] = q[qs + k] + model.dt * dp[k]
            qn = sa.quat_integrate_s(quat, omega, model.dt)
            for k in range(4):
                q_out[qs + 3 + k] = qn[k]
        else:
            q_out[qs] = q[qs] + model.dt * qd_new[vs]
    return q_out, qd_new


def _step_parts(model: RigidBodyModel, q, qd, action, contact_fn=None, f_ext_s=None,
                contact_state=None):
    """One scalar substep on per-dof scalar LISTS q [nq], qd [nv] →
    (q' list, qd' list[, contact_state']). Kinematics computed once for
    contacts + dynamics. With contact_state (flat scalar list), contact_fn
    is stateful: contact_fn(m, R, p, v, cs) → (f_ext, cs')."""
    R_wb, p_wb, Xup, S_axis = _kin_s(model, q)
    v = _vel_s(model, Xup, S_axis, qd)
    cs_new = None
    if contact_fn is not None:
        if contact_state is not None:
            f_ext_s, cs_new = contact_fn(model, R_wb, p_wb, v, contact_state)
        else:
            f_ext_s = contact_fn(model, R_wb, p_wb, v)
    M = _mass_matrix_s(model, Xup, S_axis)
    C = _bias_forces_s(model, Xup, S_axis, v, qd, f_ext_s, R_wb, p_wb)
    tau = _tau_s(model, q, action, qd)
    qdd = _spd_solve_s(M, [tau[d] - C[d] for d in range(model.nv)])
    q2, qd2 = _integrate_parts(model, q, qd, qdd)
    if contact_state is not None:
        return q2, qd2, cs_new
    return q2, qd2


def physics_step(model: RigidBodyModel, q, qd, action, contact_fn=None):
    """One substep on the scalar hot path, computing kinematics ONCE for
    both contacts and dynamics.

    contact_fn(model, R_wb, p_wb, v) → per-body 6-lists of world-frame
    spatial forces (see pql_tpu.physics.contact scalar fns); None = free
    flight. Returns (q', qd') as stacked arrays.
    """
    q_l = [q[i] for i in range(model.nq)]
    qd_l = [qd[d] for d in range(model.nv)]
    q2, qd2 = _step_parts(model, q_l, qd_l, action, contact_fn)
    return jnp.stack(q2), jnp.stack(qd2)


def physics_substeps(model: RigidBodyModel, q, qd, action, substeps: int, contact_fn=None,
                     contact_state=None):
    """`substeps` scalar substeps with PER-DOF SCALARS as the lax.scan
    carry. Carrying stacked [nq]/[nv] arrays instead forces a slice at
    every substep entry and a stack at every exit; under vmap those
    materialize as [B,1]-shaped columns that TPU tiles as T(1,128) —
    128x padded HBM traffic at every scan iteration (profiled ~140
    us/iter on Ant@4096). A tuple-of-[B]-vectors carry keeps everything
    in clean lanes; stacking happens once per control step.

    contact_state: optional flat [nc] array of anchored-contact state
    (see pql_tpu.physics.contact anchored fns) — unpacked to scalars,
    carried through the scan, repacked once. With it, contact_fn must be
    the stateful form and the return is (q', qd', contact_state')."""
    q_l = tuple(q[i] for i in range(model.nq))
    qd_l = tuple(qd[d] for d in range(model.nv))

    if contact_state is None:
        def body(carry, _):
            q_t, qd_t = carry
            q2, qd2 = _step_parts(model, list(q_t), list(qd_t), action, contact_fn)
            return (tuple(q2), tuple(qd2)), None

        (q_l, qd_l), _ = jax.lax.scan(body, (q_l, qd_l), None, length=substeps)
        return jnp.stack(q_l), jnp.stack(qd_l)

    nc = contact_state.shape[-1]
    cs_l = tuple(contact_state[..., i] for i in range(nc))

    def body(carry, _):
        q_t, qd_t, cs_t = carry
        q2, qd2, cs2 = _step_parts(
            model, list(q_t), list(qd_t), action, contact_fn,
            contact_state=list(cs_t),
        )
        return (tuple(q2), tuple(qd2), tuple(cs2)), None

    (q_l, qd_l, cs_l), _ = jax.lax.scan(body, (q_l, qd_l, cs_l), None, length=substeps)
    return jnp.stack(q_l), jnp.stack(qd_l), jnp.stack(cs_l, axis=-1)


def _fd_core(model: RigidBodyModel, q, qd, action, f_ext_s, kin=None):
    """Scalar forward-dynamics step given external forces as 6-lists
    (stacked-array interface for fd_step)."""
    q_l = [q[i] for i in range(model.nq)]
    qd_l = [qd[d] for d in range(model.nv)]
    q2, qd2 = _step_parts(model, q_l, qd_l, action, contact_fn=None, f_ext_s=f_ext_s)
    return jnp.stack(q2), jnp.stack(qd2)


def fd_step(model: RigidBodyModel, q, qd, action, f_ext_world):
    """One semi-implicit Euler step of forward dynamics.

    f_ext_world: [nb, 6] world-frame spatial contact forces (zeros if none).
    Returns (q', qd', aux) where aux carries kinematics for observation
    construction (R_wb, p_wb, body spatial velocities). Runs on the
    scalar-unrolled core; the matrix functions above remain the reference
    implementation (tests assert they agree)."""
    f_ext_s = [[f_ext_world[i, j] for j in range(6)] for i in range(model.nb)]
    kin = _kin_s(model, q)
    R_wb, p_wb, Xup, S_axis = kin
    qd_l = [qd[d] for d in range(model.nv)]
    v = _vel_s(model, Xup, S_axis, qd_l)
    q_new, qd_new = _fd_core(model, q, qd, action, f_ext_s)
    aux = {
        "R_wb": jnp.stack([jnp.stack([jnp.stack(r) for r in R]) for R in R_wb]),
        "p_wb": jnp.stack([jnp.stack(p) for p in p_wb]),
        "v_body": jnp.stack([jnp.stack(x) for x in v]),
    }
    return q_new, qd_new, aux
