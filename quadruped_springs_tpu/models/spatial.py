"""Quaternion / SO(3) / spatial (6D) rigid-body algebra for TPU.

Conventions
-----------
* Quaternions are stored **xyzw** (PyBullet / scipy convention) so that state
  parity with the reference environment (quadruped-springs) is direct.
* Spatial (Plücker) vectors are ordered **[angular; linear]** (Featherstone).
* Rotation matrices map body coordinates to world coordinates: ``x_w = R x_b``.
* Euler "roll-pitch-yaw" follows PyBullet's ``getEulerFromQuaternion``:
  ``R = Rz(yaw) @ Ry(pitch) @ Rx(roll)``.

Everything is pure jnp, shape-polymorphic over leading batch dims, and safe to
``vmap`` / ``jit`` / differentiate.

Reference behavior being reproduced (structure only, not code):
  /root/reference/quadruped_spring/env/quadruped.py (PyBullet quaternion use)
"""

from __future__ import annotations

import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions (xyzw)
# ---------------------------------------------------------------------------

QUAT_IDENTITY = jnp.array([0.0, 0.0, 0.0, 1.0])


def quat_normalize(q):
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_conj(q):
    """Conjugate (= inverse for unit quaternions)."""
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0])


def quat_mul(q1, q2):
    """Hamilton product, xyzw layout: rotation q1 then... (q = q1 ⊗ q2).

    ``quat_rotate(quat_mul(q1, q2), v) == quat_rotate(q1, quat_rotate(q2, v))``
    """
    x1, y1, z1, w1 = jnp.split(q1, 4, axis=-1)
    x2, y2, z2, w2 = jnp.split(q2, 4, axis=-1)
    return jnp.concatenate(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_rotate(q, v):
    """Rotate vector v by unit quaternion q (body -> world if q is base quat)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inv(q, v):
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q):
    """3x3 rotation matrix from xyzw quaternion."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_axis_angle(axis, angle):
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = 0.5 * angle[..., None]
    return jnp.concatenate([axis * jnp.sin(half), jnp.cos(half)], axis=-1)


def quat_integrate(q, omega_body, dt):
    """Integrate unit quaternion with body-frame angular velocity (exp map).

    q_{t+1} = q_t ⊗ exp(dt * ω_b / 2).  Exact for constant ω over dt.
    """
    # Gradient-safe small-angle handling: sqrt at 0 has a NaN derivative, so
    # the unsafe branch's *input* is sanitized before the `where` (the iLQR
    # solver differentiates through the integrator in forward mode).
    n2 = jnp.sum(omega_body * omega_body, axis=-1, keepdims=True)
    small = n2 < 1e-14
    angle = jnp.sqrt(jnp.where(small, 1.0, n2))
    half = 0.5 * dt * angle
    h2 = (0.5 * dt) ** 2 * n2
    k = jnp.where(small, 0.5 * dt * (1.0 - h2 / 6.0), jnp.sin(half) / angle)
    c = jnp.where(small, 1.0 - h2 / 2.0, jnp.cos(half))
    dq = jnp.concatenate([omega_body * k, c], axis=-1)
    return quat_normalize(quat_mul(q, dq))


def quat_to_rpy(q):
    """PyBullet-convention euler: R = Rz(yaw) Ry(pitch) Rx(roll).

    Matches ``pybullet.getEulerFromQuaternion`` used throughout the reference
    (e.g. quadruped.py GetBaseOrientationRollPitchYaw).
    """
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # roll (x-axis rotation)
    sinr_cosp = 2 * (w * x + y * z)
    cosr_cosp = 1 - 2 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    # pitch (y-axis rotation)
    sinp = jnp.clip(2 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    # yaw (z-axis rotation)
    siny_cosp = 2 * (w * z + x * y)
    cosy_cosp = 1 - 2 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return jnp.stack([roll, pitch, yaw], axis=-1)


def rpy_to_quat(rpy):
    """Inverse of quat_to_rpy."""
    half = 0.5 * rpy
    cr, cp, cy = jnp.cos(half[..., 0]), jnp.cos(half[..., 1]), jnp.cos(half[..., 2])
    sr, sp, sy = jnp.sin(half[..., 0]), jnp.sin(half[..., 1]), jnp.sin(half[..., 2])
    return jnp.stack(
        [
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
            cr * cp * cy + sr * sp * sy,
        ],
        axis=-1,
    )


def pitch_unwrapped_yxz(q, switched):
    """Backflip pitch: intrinsic y-x-z euler first angle, negated; +2π wrap.

    Mirrors the reference sensor PitchBackFlip._get_pitch
    (env/sensors/robot_sensors.py:330-340): ``scipy R.as_euler("yxz")`` is the
    *extrinsic* y-x-z decomposition R = Rz(c) Rx(b) Ry(a) (lowercase seq =
    extrinsic in scipy); pitch = -a (innermost Ry angle), and after the
    landing-controller switch negative pitch is unwrapped by +2π.
    """
    m = quat_to_mat(q)
    # R = Rz(c) Rx(b) Ry(a): row 2 is unaffected by Rz:
    #   m[2,0] = -cos(b) sin(a);  m[2,1] = sin(b);  m[2,2] = cos(b) cos(a)
    a = jnp.arctan2(-m[..., 2, 0], m[..., 2, 2])
    pitch = -a
    return jnp.where(switched & (pitch < 0), 2 * jnp.pi + pitch, pitch)


# ---------------------------------------------------------------------------
# SO(3) helpers
# ---------------------------------------------------------------------------

def safe_norm(v, axis=-1, eps=1e-12):
    """Norm with a finite gradient at v=0 (returns sqrt(eps) there).

    Required anywhere the solver differentiates through a norm of a
    quantity that can be exactly zero (tangential contact velocity, angular
    velocity): jnp.linalg.norm has a NaN derivative at 0 which poisons the
    whole iLQR Jacobian through 0·NaN product rules.
    """
    n2 = jnp.sum(v * v, axis=axis)
    return jnp.sqrt(jnp.where(n2 < eps, eps, n2))


def skew(v):
    """3x3 skew-symmetric matrix s.t. skew(a) @ b = a × b."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# Spatial (6D) algebra — [angular; linear] ordering, Featherstone-style.
# All spatial quantities below are expressed in a single common frame
# (we use the base frame in dynamics.py), so no Plücker transforms of
# 6-vectors are needed; bodies carry (R, p) to map their local inertia.
# ---------------------------------------------------------------------------

def spatial_inertia(mass, com, inertia_at_com):
    """6x6 spatial inertia about the *frame origin*, given COM offset.

    I = [[ I_com + m c× c×ᵀ,  m c× ],
         [ m c×ᵀ,             m 1  ]]
    with c = com offset from frame origin (in frame coords).
    """
    c = skew(com)
    mcx = mass[..., None, None] * c
    top_left = inertia_at_com + mcx @ jnp.swapaxes(c, -1, -2)
    eye = jnp.broadcast_to(jnp.eye(3), c.shape)
    m_eye = mass[..., None, None] * eye
    top = jnp.concatenate([top_left, mcx], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(mcx, -1, -2), m_eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def transform_spatial_inertia(I6, R, p):
    """Express spatial inertia I6 (local frame) in a frame where the local
    frame is at rotation R, origin p:  I' = X^{-T} I X^{-1} done blockwise.

    Blockwise (standard result): with H = I6 rotated by R,
      I'_aa = R I_aa Rᵀ + p× R I_ab Rᵀ + (R I_ab Rᵀ)ᵀ p×ᵀ + p× (m 1) p×ᵀ ...
    We implement via the generic congruence with
      X = [[R, p× R], [0, R]]  (force transform from local to common frame).
    """
    px = skew(p)
    zero = jnp.zeros_like(R)
    top = jnp.concatenate([R, px @ R], axis=-1)
    bot = jnp.concatenate([zero, R], axis=-1)
    X = jnp.concatenate([top, bot], axis=-2)  # maps local force -> common force
    return X @ I6 @ jnp.swapaxes(X, -1, -2)


def crm(v):
    """Spatial cross-product matrix (motion): crm(v) @ m = v ×ₘ m."""
    w, vo = v[..., :3], v[..., 3:]
    wx, vx = skew(w), skew(vo)
    zero = jnp.zeros_like(wx)
    top = jnp.concatenate([wx, zero], axis=-1)
    bot = jnp.concatenate([vx, wx], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def crf(v):
    """Spatial cross-product matrix (force): crf(v) = -crm(v)ᵀ."""
    return -jnp.swapaxes(crm(v), -1, -2)


def spatial_cross_motion(v, m):
    """v ×ₘ m for motion vector m."""
    w, vo = v[..., :3], v[..., 3:]
    mw, mv = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(vo, mw) + jnp.cross(w, mv)], axis=-1
    )


def spatial_cross_force(v, f):
    """v ×f* f for force vector f."""
    w, vo = v[..., :3], v[..., 3:]
    fw, fv = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, fw) + jnp.cross(vo, fv), jnp.cross(w, fv)], axis=-1
    )
