"""Hopf-oscillator CPG (central pattern generator) as a JAX dynamical system.

TPU-native re-design of hopf_network.py: the polar Hopf equations with
4x4 phase-coupling matrices (TROT / WALK / PACE / BOUND, hopf_network.py:
74-115), integrated at 1 kHz, mapped to Cartesian foot (x, z) references
(:117-135), plus the joint-PD + Cartesian-PD (JᵀF) torque law of the main
loop (:176-293). Used both for classical (non-RL) locomotion and as warm
starts for the MPC solver.

All state is an explicit (2, 4) array [r; θ]; update is pure, vectorized
over the 4 oscillators (no per-leg Python loops) and batcheable.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from quadruped_springs_tpu.models import kinematics as kin
from quadruped_springs_tpu.models.go1_params import Go1Config

_PI = jnp.pi

# Phase-coupling matrices PHI[i, j] (hopf_network.py:78-100)
PHI_TROT = jnp.array([
    [0, -_PI, -_PI, 0],
    [_PI, 0, 0, _PI],
    [_PI, 0, 0, _PI],
    [0, -_PI, -_PI, 0],
])
PHI_WALK = jnp.array([
    [0, -_PI, -_PI / 2, _PI / 2],
    [_PI, 0, _PI / 2, 3 * _PI / 2],
    [_PI / 2, -_PI / 2, 0, _PI],
    [-_PI / 2, -3 * _PI / 2, -_PI, 0],
])
PHI_BOUND = jnp.array([
    [0, 0, -_PI, -_PI],
    [0, 0, -_PI, -_PI],
    [_PI, _PI, 0, 0],
    [_PI, _PI, 0, 0],
])
PHI_PACE = jnp.array([
    [0, -_PI, 0, -_PI],
    [_PI, 0, _PI, 0],
    [0, -_PI, 0, -_PI],
    [_PI, 0, _PI, 0],
])
GAITS = {"TROT": PHI_TROT, "WALK": PHI_WALK, "BOUND": PHI_BOUND, "PACE": PHI_PACE}


@dataclasses.dataclass(frozen=True)
class HopfParams:
    """CPG parameters (hopf_network.py:33-46 defaults)."""
    mu: float = 2.0
    omega_swing: float = 2 * float(_PI)
    omega_stance: float = 2 * float(_PI)
    gait: str = "TROT"
    coupling_strength: float = 1.0
    couple: bool = True
    time_step: float = 0.001
    ground_clearance: float = 0.05
    ground_penetration: float = 0.01
    robot_height: float = 0.25
    des_step_len: float = 0.04
    alpha: float = 50.0


def init_state(params: HopfParams, key: jax.Array) -> jnp.ndarray:
    """X = [[r (4)], [θ (4)]]; r random in [0, 0.1), θ at the gait offsets."""
    r0 = jax.random.uniform(key, (4,)) * 0.1
    theta0 = GAITS[params.gait][0, :]
    return jnp.stack([r0, theta0])


def cpg_update(params: HopfParams, X: jnp.ndarray):
    """One 1 kHz integration step; returns (X_next, foot_x(4), foot_z(4)).

    Hopf polar dynamics (hopf_network.py:137-173):
      ṙ_i = α (μ - r_i²) r_i
      θ̇_i = ω(swing/stance by sin θ) + Σ_j r_j c sin(θ_j - θ_i - Φ_ij)
    mapped to foot references (:123-135).
    """
    r, theta = X[0], X[1]
    r_dot = params.alpha * (params.mu - r**2) * r
    swing = jnp.sin(theta) > 0
    theta_dot = jnp.where(swing, params.omega_swing, params.omega_stance)
    if params.couple:
        phi = GAITS[params.gait]
        diff = theta[None, :] - theta[:, None] - phi  # [i, j] = θ_j - θ_i - Φ_ij
        coupling = jnp.sum(r[None, :] * params.coupling_strength * jnp.sin(diff)
                           * (1 - jnp.eye(4)), axis=1)
        theta_dot = theta_dot + coupling
    r = r + params.time_step * r_dot
    theta = jnp.mod(theta + params.time_step * theta_dot, 2 * _PI)
    X_next = jnp.stack([r, theta])

    x = -params.des_step_len * r * jnp.cos(theta)
    sin_t = jnp.sin(theta)
    amp = jnp.where(sin_t > 0, params.ground_clearance, params.ground_penetration)
    z = -params.robot_height + amp * sin_t
    return X_next, x, z


def cpg_torques(cfg: Go1Config, q: jnp.ndarray, qd: jnp.ndarray,
                foot_x: jnp.ndarray, foot_z: jnp.ndarray,
                foot_y: float = 0.0838,
                kp_joint=None, kd_joint=None):
    """Joint-PD + Cartesian-PD (JᵀF) torque law of the CPG main loop
    (hopf_network.py:257-286). Returns (12,) torques.

    τ = kp (q_des - q) + kd (q̇_des - q̇) + Jᵀ [kp_C (p_des - p) + kd_C (-v)]
    with q_des from IK of the desired foot position and q̇_des = 0.
    """
    from quadruped_springs_tpu.models.go1_params import SIDE_SIGN

    des_xyz = jnp.stack(
        [foot_x, jnp.asarray(SIDE_SIGN) * foot_y, foot_z], axis=-1)  # (4,3)
    q_legs = q.reshape(4, 3)
    qd_legs = qd.reshape(4, 3)
    q_des = kin.inverse_kinematics(des_xyz)
    kp_j = cfg.motor_kp.reshape(4, 3) if kp_joint is None else kp_joint
    kd_j = cfg.motor_kd.reshape(4, 3) if kd_joint is None else kd_joint
    tau = kp_j * (q_des - q_legs) + kd_j * (0.0 - qd_legs)

    J = kin.foot_jacobian(q_legs)                    # (4,3,3)
    p = kin.foot_position(q_legs)                    # (4,3)
    v = jnp.einsum("lij,lj->li", J, qd_legs)
    F = jnp.einsum("ab,lb->la", cfg.kp_cartesian, des_xyz - p) \
        + jnp.einsum("ab,lb->la", cfg.kd_cartesian, -v)
    tau = tau + jnp.einsum("lji,lj->li", J, F)       # Jᵀ F
    return tau.reshape(12)
