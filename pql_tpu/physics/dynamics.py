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


def actuation(model: RigidBodyModel, action: jax.Array) -> jax.Array:
    """Map [-1,1]^nu policy actions to joint torques via gear."""
    tau = jnp.zeros(model.nv)
    gear = jnp.asarray(model.gear)
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


def fd_step(model: RigidBodyModel, q, qd, action, f_ext_world):
    """One semi-implicit Euler step of forward dynamics.

    f_ext_world: [nb, 6] world-frame spatial contact forces (zeros if none).
    Returns (q', qd', aux) where aux carries kinematics for observation
    construction (R_wb, p_wb, body spatial velocities).
    """
    R_wb, p_wb, Xup, S = fwd_kinematics(model, q)
    v = body_velocities(model, Xup, S, qd)
    M = mass_matrix(model, Xup, S)
    C = bias_forces(model, Xup, S, v, qd, f_ext_world, R_wb, p_wb)
    tau = actuation(model, action) + _limit_torque(model, q)
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
            q_new = q_new.at[qs + 3 : qs + 7].set(sp.quat_integrate(quat, omega, model.dt))
        else:
            q_new = q_new.at[qs].add(model.dt * qd_new[vs])
    aux = {"R_wb": R_wb, "p_wb": p_wb, "v_body": jnp.stack(v)}
    return q_new, qd_new, aux
