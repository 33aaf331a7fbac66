"""Analytic leg kinematics (leg/hip frame): FK, Jacobian, IK.

Numerically identical to the reference's closed-form per-leg kinematics
(quadruped.py:348-392 `_compute_jacobian_and_position`,
 quadruped.py:399-438 `ComputeInverseKinematics`,
 quadruped.py:440-449 `ComputeFeetPosAndVel`), but written once and
vectorized over all 4 legs (and any leading batch dims) so a single call
maps onto the TPU VPU; no per-leg Python loops.

The "leg frame" has its origin at the hip joint, axes aligned with the trunk.
sideSign is -1 for right legs (FR, RR), +1 for left (FL, RL).
"""

from __future__ import annotations

import jax.numpy as jnp

from quadruped_springs_tpu.models.go1_params import (
    CALF_LINK_LENGTH,
    HIP_LINK_LENGTH,
    SIDE_SIGN,
    THIGH_LINK_LENGTH,
)

_L1 = HIP_LINK_LENGTH
_L2 = THIGH_LINK_LENGTH
_L3 = CALF_LINK_LENGTH


def foot_position(q_legs, side_sign=None):
    """Foot positions in leg frames.

    Args:
      q_legs: (..., 4, 3) joint angles per leg [hip, thigh, calf].
      side_sign: (4,) optional override.
    Returns:
      (..., 4, 3) foot xyz per leg.
    """
    if side_sign is None:
        side_sign = jnp.asarray(SIDE_SIGN, dtype=q_legs.dtype)
    s1, s2, s3 = jnp.sin(q_legs[..., 0]), jnp.sin(q_legs[..., 1]), jnp.sin(q_legs[..., 2])
    c1, c2, c3 = jnp.cos(q_legs[..., 0]), jnp.cos(q_legs[..., 1]), jnp.cos(q_legs[..., 2])
    c23 = c2 * c3 - s2 * s3
    s23 = s2 * c3 + c2 * s3
    x = -_L3 * s23 - _L2 * s2
    y = _L1 * side_sign * c1 + _L3 * s1 * c23 + _L2 * c2 * s1
    z = _L1 * side_sign * s1 - _L3 * c1 * c23 - _L2 * c1 * c2
    return jnp.stack([x, y, z], axis=-1)


def foot_jacobian(q_legs, side_sign=None):
    """Per-leg 3x3 foot Jacobian d(foot pos)/d(q), leg frame.

    Args:
      q_legs: (..., 4, 3).
    Returns:
      (..., 4, 3, 3).
    """
    if side_sign is None:
        side_sign = jnp.asarray(SIDE_SIGN, dtype=q_legs.dtype)
    s1, s2, s3 = jnp.sin(q_legs[..., 0]), jnp.sin(q_legs[..., 1]), jnp.sin(q_legs[..., 2])
    c1, c2, c3 = jnp.cos(q_legs[..., 0]), jnp.cos(q_legs[..., 1]), jnp.cos(q_legs[..., 2])
    c23 = c2 * c3 - s2 * s3
    s23 = s2 * c3 + c2 * s3
    zero = jnp.zeros_like(s1)
    j00 = zero
    j01 = -_L3 * c23 - _L2 * c2
    j02 = -_L3 * c23
    j10 = -side_sign * _L1 * s1 + _L2 * c2 * c1 + _L3 * c23 * c1
    j11 = -_L2 * s2 * s1 - _L3 * s23 * s1
    j12 = -_L3 * s23 * s1
    j20 = side_sign * _L1 * c1 + _L2 * c2 * s1 + _L3 * c23 * s1
    j21 = _L2 * s2 * c1 + _L3 * s23 * c1
    j22 = _L3 * s23 * c1
    rows = jnp.stack(
        [
            jnp.stack([j00, j01, j02], axis=-1),
            jnp.stack([j10, j11, j12], axis=-1),
            jnp.stack([j20, j21, j22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def foot_pos_and_vel(q, qd):
    """Feet positions and velocities, flat (...,12) in / (...,12) out.

    Mirrors quadruped.py:440-449 ComputeFeetPosAndVel.
    """
    q_legs = q.reshape(q.shape[:-1] + (4, 3))
    qd_legs = qd.reshape(qd.shape[:-1] + (4, 3))
    pos = foot_position(q_legs)
    jac = foot_jacobian(q_legs)
    vel = jnp.einsum("...ij,...j->...i", jac, qd_legs)
    return pos.reshape(q.shape), vel.reshape(q.shape)


def inverse_kinematics(foot_xyz, side_sign=None):
    """Closed-form leg IK (leg frame), mirrors quadruped.py:399-438.

    Args:
      foot_xyz: (..., 4, 3) desired foot positions per leg.
    Returns:
      (..., 4, 3) joint angles [hip, thigh, calf].
    """
    if side_sign is None:
        side_sign = jnp.asarray(SIDE_SIGN, dtype=foot_xyz.dtype)
    x, y, z = foot_xyz[..., 0], foot_xyz[..., 1], foot_xyz[..., 2]
    D = (y**2 + z**2 - _L1**2 + x**2 - _L2**2 - _L3**2) / (2 * _L3 * _L2)
    D = jnp.clip(D, -1.0, 1.0)
    # sqrt(1-D^2) has infinite gradient at |D|=1; clamp the radicand for a
    # finite (sub)gradient so the IK stays usable inside optimizers.
    sqrt1mD2 = jnp.sqrt(jnp.maximum(1.0 - D**2, 1e-12))
    wrist = jnp.arctan2(-sqrt1mD2, D)
    sqrt_comp = jnp.maximum(y**2 + z**2 - _L1**2, 0.0)
    sqrt_comp_s = jnp.sqrt(jnp.maximum(sqrt_comp, 1e-12)) * (sqrt_comp > 0)
    shoulder = -jnp.arctan2(z, y) - jnp.arctan2(sqrt_comp_s, side_sign * _L1)
    elbow = jnp.arctan2(-x, sqrt_comp_s) - jnp.arctan2(
        _L3 * jnp.sin(wrist), _L2 + _L3 * jnp.cos(wrist)
    )
    return jnp.stack([-shoulder, elbow, wrist], axis=-1)


def inverse_kinematics_flat(foot_pos_flat):
    """(...,12) -> (...,12) convenience wrapper."""
    legs = foot_pos_flat.reshape(foot_pos_flat.shape[:-1] + (4, 3))
    return inverse_kinematics(legs).reshape(foot_pos_flat.shape)
