"""Spatial (6-D) vector algebra and quaternion utilities.

Foundation of the in-repo rigid-body engine that replaces the reference's
dependency on Isaac Gym / PhysX (reference pql/utils/isaacgym_util.py —
the only native sim interface). Conventions follow Featherstone's Rigid
Body Dynamics Algorithms: motion vectors are [ω; v] in body coordinates,
forces are [n; f]; a Plücker transform ^B X_A is parameterized by the
rotation E (A-coords → B-coords) and the origin of B expressed in A
coords, r.

Everything here is pure jnp on small fixed shapes (3-vectors, quats, 6×6
blocks); the engine vmaps these across thousands of envs and XLA fuses the
whole step into one kernel — the TPU-native analog of PhysX's lockstep GPU
pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v):
    """3×3 cross-product matrix: skew(v) @ u == v × u."""
    x, y, z = v[0], v[1], v[2]
    zero = jnp.zeros_like(x)
    return jnp.array([[zero, -z, y], [z, zero, -x], [-y, x, zero]])


# ----------------------------------------------------------------- quats
# quaternions are (w, x, y, z), unit norm, rotating body → world


def quat_identity():
    return jnp.array([1.0, 0.0, 0.0, 0.0])


def quat_mul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


def quat_rotate(q, v):
    """Rotate v by q (body → world)."""
    qv = q[1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + q[0] * t + jnp.cross(qv, t)


def quat_inv(q):
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_to_mat(q):
    """Rotation matrix R with R @ v_body = v_world."""
    w, x, y, z = q
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def quat_integrate(q, omega_body, dt):
    """q̇ = ½ q ⊗ [0, ω_body]; renormalized semi-implicit update."""
    dq = 0.5 * quat_mul(q, jnp.concatenate([jnp.zeros(1), omega_body]))
    q = q + dt * dq
    return q / jnp.linalg.norm(q)


def quat_from_axis_angle(axis, angle):
    half = 0.5 * angle
    return jnp.concatenate([jnp.cos(half)[None], jnp.sin(half) * axis])


def axis_angle_to_mat(axis, angle):
    """Rodrigues rotation matrix (axis assumed unit)."""
    K = skew(axis)
    s, c = jnp.sin(angle), jnp.cos(angle)
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


# ---------------------------------------------------------- 6×6 transforms


def xmat(E, r):
    """Motion transform ^B X_A as 6×6: [ω;v] ↦ [Eω; E(v − r×ω)]."""
    Z = jnp.zeros((3, 3))
    return jnp.block([[E, Z], [-E @ skew(r), E]])


def xmat_force(E, r):
    """Force transform ^B X*_A: [n;f] ↦ [E(n − r×f); Ef]. Equals
    xmat(E, r)^{-T}."""
    Z = jnp.zeros((3, 3))
    return jnp.block([[E, -E @ skew(r)], [Z, E]])


def xmat_inv(E, r):
    """^A X_B given ^B X_A params (E, r)."""
    return xmat(E.T, -E @ r)


def crm(v):
    """Spatial motion cross product matrix: crm(v) @ u = v ×ₘ u."""
    w, vl = v[:3], v[3:]
    Z = jnp.zeros((3, 3))
    return jnp.block([[skew(w), Z], [skew(vl), skew(w)]])


def crf(v):
    """Spatial force cross product: crf(v) @ f = v ×* f = -crm(v)^T f."""
    return -crm(v).T


def spatial_inertia(mass, com, inertia_com):
    """6×6 spatial inertia about the body frame origin: mass, com offset c
    (body frame), rotational inertia about the com (3×3)."""
    C = skew(com)
    I_bar = inertia_com + mass * (C @ C.T)
    return jnp.block([[I_bar, mass * C], [mass * C.T, mass * jnp.eye(3)]])
