"""In-repo JAX rigid-body physics engine.

Replaces the reference's external native simulation stack (Isaac Gym /
PhysX, reference pql/utils/isaacgym_util.py) with a reduced-coordinate
articulated dynamics engine (CRBA + RNEA + penalty contacts) that jit-fuses
with the RL training step and shards across the TPU mesh env axis.
"""

from pql_tpu.physics.model import RigidBodyModel, Geom, FREE, HINGE
from pql_tpu.physics.dynamics import fd_step, fwd_kinematics, mass_matrix, body_velocities
from pql_tpu.physics.contact import ground_contacts, sphere_box_contacts

__all__ = [
    "RigidBodyModel",
    "Geom",
    "FREE",
    "HINGE",
    "fd_step",
    "fwd_kinematics",
    "mass_matrix",
    "body_velocities",
    "ground_contacts",
    "sphere_box_contacts",
]
