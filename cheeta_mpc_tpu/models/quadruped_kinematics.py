"""Analytic quadruped kinematics in JAX.

The reference outsources foot forward kinematics and Jacobians to
Pinocchio + CppAD code generation over the ANYmal-C URDF
(``PinocchioEndEffectorKinematicsCppAd`` used at
``ocs2_legged_robot/src/LeggedRobotInterface.cpp:171``; the URDF lives in the
external ``ocs2_robotic_assets``, not vendored). Here the kinematics are
closed-form JAX for a generic 3-DoF-per-leg quadruped (HAA/HFE/KFE — hip
abduction, hip flexion, knee flexion), with ``jax.jacfwd`` supplying exact
Jacobians; link parameters default to ANYmal-C-like values.

Conventions (matching the reference's task.info state layout):
- Base pose: position p (world) + euler angles (z-y-x yaw/pitch/roll).
- Leg order [LF, LH, RF, RH] for the *joint vector* (task.info:126-147
  comment order) mapped onto contact order [LF, RF, LH, RH]
  (MotionPhaseDefinition).
- Each leg: q = (HAA, HFE, KFE). HAA rotates about x (abduction), HFE and
  KFE about y (flexion) in the leg frame.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QuadrupedDescription(NamedTuple):
    """Geometry + inertial description (ANYmal-C-like defaults)."""

    # hip (HAA axis) offsets from base center, per leg [LF, RF, LH, RH]:
    hip_offsets: tuple = ((0.3, 0.1, 0.0), (0.3, -0.1, 0.0),
                          (-0.3, 0.1, 0.0), (-0.3, -0.1, 0.0))
    # lateral offset from HAA to the leg (thigh) plane, signed per side
    hip_length: float = 0.1
    thigh_length: float = 0.285
    shank_length: float = 0.33
    mass: float = 30.0  # total SRBD mass
    inertia: tuple = (0.88, 1.85, 1.97)  # SRBD body-frame diagonal inertia
    com_offset: tuple = (0.0, 0.0, 0.0)  # CoM offset from base origin (body)

    @property
    def num_legs(self) -> int:
        return 4


def euler_zyx_to_rot(eul: jnp.ndarray) -> jnp.ndarray:
    """R = Rz(yaw) Ry(pitch) Rx(roll); eul = (yaw, pitch, roll)
    (ocs2 convention: theta_base_z, _y, _x in task.info:121-123)."""
    z, y, x = eul[0], eul[1], eul[2]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cx, sx = jnp.cos(x), jnp.sin(x)
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], eul.dtype)
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], eul.dtype)
    Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]], eul.dtype)
    return Rz @ Ry @ Rx


def euler_zyx_rate_matrix(eul: jnp.ndarray) -> jnp.ndarray:
    """E(eul) with omega_world = E @ eul_dot for z-y-x euler angles."""
    z, y = eul[0], eul[1]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    return jnp.array([[0.0, -sz, cz * cy],
                      [0.0, cz, sz * cy],
                      [1.0, 0.0, -sy]], eul.dtype)


def euler_zyx_rate_matrix_inv(eul: jnp.ndarray) -> jnp.ndarray:
    """E^{-1}(eul): eul_dot = E^{-1} omega_world (singular at pitch +-pi/2)."""
    z, y = eul[0], eul[1]
    cz, sz = jnp.cos(z), jnp.sin(z)
    cy, sy = jnp.cos(y), jnp.sin(y)
    ty = sy / cy
    return jnp.array([[cz * ty, sz * ty, 1.0],
                      [-sz, cz, 0.0],
                      [cz / cy, sz / cy, 0.0]], eul.dtype)


def _leg_side_sign(leg: int) -> float:
    """+1 for left legs (LF=0, LH=2), -1 for right (RF=1, RH=3)."""
    return 1.0 if leg in (0, 2) else -1.0


def foot_position_body(desc: QuadrupedDescription, leg: int,
                       q_leg: jnp.ndarray) -> jnp.ndarray:
    """Foot position in the base frame for one leg. q_leg = (HAA, HFE, KFE)."""
    haa, hfe, kfe = q_leg[0], q_leg[1], q_leg[2]
    side = _leg_side_sign(leg)
    # In the leg sagittal plane (after HAA rotation about x):
    #   thigh at angle hfe from vertical, shank at hfe + kfe.
    px = -(desc.thigh_length * jnp.sin(hfe)
           + desc.shank_length * jnp.sin(hfe + kfe))
    pz_plane = -(desc.thigh_length * jnp.cos(hfe)
                 + desc.shank_length * jnp.cos(hfe + kfe))
    py_leg = side * desc.hip_length
    # HAA rotation about x maps the (y, z) leg-plane coordinates.
    ca, sa = jnp.cos(haa), jnp.sin(haa)
    py = ca * py_leg - sa * pz_plane
    pz = sa * py_leg + ca * pz_plane
    hip = jnp.asarray(desc.hip_offsets[leg], q_leg.dtype)
    return hip + jnp.stack([px, py, pz])


def foot_positions_world(desc: QuadrupedDescription, base_pos, base_eul,
                         q_joints) -> jnp.ndarray:
    """(4, 3) world foot positions.

    q_joints: (12,) in task.info leg order [LF, LH, RF, RH] x (HAA,HFE,KFE).
    Returned rows are in contact order [LF, RF, LH, RH].
    """
    R = euler_zyx_to_rot(base_eul)
    # joint-vector leg order -> contact leg order mapping
    joint_slot = {0: 0, 1: 2, 2: 1, 3: 3}  # contact leg -> joint block
    feet = []
    for leg in range(4):
        js = joint_slot[leg]
        q_leg = jax.lax.dynamic_slice(q_joints, (3 * js,), (3,))
        p_body = foot_position_body(desc, leg, q_leg)
        feet.append(base_pos + R @ p_body)
    return jnp.stack(feet)


def foot_velocities_world(desc: QuadrupedDescription, base_pos, base_eul,
                          q_joints, base_lin_vel, eul_rate,
                          qd_joints) -> jnp.ndarray:
    """(4, 3) world foot velocities via forward-mode AD of the FK chain."""

    def fk(args):
        bp, be, qj = args
        return foot_positions_world(desc, bp, be, qj)

    primals = (base_pos, base_eul, q_joints)
    tangents = (base_lin_vel, eul_rate, qd_joints)
    _, vel = jax.jvp(fk, (primals,), (tangents,))
    return vel


def foot_jacobians(desc: QuadrupedDescription, base_pos, base_eul, q_joints):
    """d foot_pos / d (base_pos(3), base_eul(3), q_joints(12)): (4, 3, 18)."""
    def fk(z):
        return foot_positions_world(desc, z[0:3], z[3:6], z[6:18])
    z = jnp.concatenate([base_pos, base_eul, q_joints])
    return jax.jacfwd(fk)(z)
