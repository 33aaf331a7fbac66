"""Actuation ops: PD motor model + one-sided PEA spring law.

TPU-native equivalent of the reference's
  * QuadrupedMotorModel.convert_to_torque (quadruped_motor.py:45-99):
    τ = -kp (q - q_des) - kd (qd - qd_des), clipped to ±torque_limits;
    TORQUE mode is a pass-through with the same clip.
  * Springs (springs.py:34-79): joint-level springs in parallel with the
    motors that act only in compression — per-side hip condition (right
    legs: active iff q_hip ≥ rest; left: iff q_hip ≤ rest), thigh active iff
    q ≥ rest, calf active iff q ≤ rest; τ_s = -k (q - q_rest) - b qd with
    k,b zeroed when inactive.

All functions are elementwise over the 12 motors and vmap over arbitrary
batch dims; XLA fuses them into the surrounding dynamics graph
(hand-fused Pallas variants were benchmarked on-chip and removed —
docs/PALLAS_DECISION.md).
"""

from __future__ import annotations

import jax.numpy as jnp

from quadruped_springs_tpu.models.go1_params import SIDE_SIGN, Go1Config

# Per-motor activation sign: spring engages when sign*(q - rest) >= 0.
# From springs.py:34-61 (k zeroed when the condition below FAILS):
#   hip, left legs (side +1): engaged iff q >= rest -> sign +1
#   hip, right legs (side -1): engaged iff q <= rest -> sign -1
#   thigh: engaged iff q >= rest -> +1 ;  calf: engaged iff q <= rest -> -1
_HIP_SIGN = jnp.asarray(SIDE_SIGN)            # (4,)
SPRING_ENGAGE_SIGN = jnp.stack(
    [_HIP_SIGN, jnp.ones(4), -jnp.ones(4)], axis=-1
).reshape(12)


def pd_torque(q_des, q, qd, kp, kd, torque_limits, qd_des=None):
    """PD position control to torque with clipping (quadruped_motor.py:88-97)."""
    if qd_des is None:
        qd_des = jnp.zeros_like(qd)
    tau = -kp * (q - q_des) - kd * (qd - qd_des)
    return jnp.clip(tau, -torque_limits, torque_limits)


def torque_command(tau_cmd, torque_limits):
    """TORQUE mode pass-through with clip (quadruped_motor.py:67-72)."""
    return jnp.clip(tau_cmd, -torque_limits, torque_limits)


def spring_activation(q, rest_angles12):
    """Boolean (...,12) mask of engaged springs (compression only)."""
    return SPRING_ENGAGE_SIGN * (q - rest_angles12) >= 0.0


def spring_torque(q, qd, stiffness3, damping3, rest_angles3):
    """One-sided PEA spring torque for all 12 joints.

    Args:
      q, qd: (...,12).
      stiffness3/damping3/rest_angles3: (3,) or (...,3) per joint type
        (randomizable per scenario, env_randomizer.py:86-122).
    """
    k12 = jnp.tile(jnp.asarray(stiffness3), 4)
    b12 = jnp.tile(jnp.asarray(damping3), 4)
    r12 = jnp.tile(jnp.asarray(rest_angles3), 4)
    engaged = spring_activation(q, r12)
    tau = -k12 * (q - r12) - b12 * qd
    return jnp.where(engaged, tau, 0.0)


def spring_energy(q, stiffness3, rest_angles3):
    """Elastic energy U = ½ k (q - q̄)² of engaged springs (the
    monitor_state.py spring-energy plot, utils/monitor_state.py:297-341)."""
    k12 = jnp.tile(jnp.asarray(stiffness3), 4)
    r12 = jnp.tile(jnp.asarray(rest_angles3), 4)
    engaged = spring_activation(q, r12)
    return jnp.where(engaged, 0.5 * k12 * (q - r12) ** 2, 0.0)


def motor_and_spring_torque(cfg: Go1Config, q_des, q, qd,
                            kp=None, kd=None,
                            spring_k=None, spring_d=None, spring_rest=None):
    """Combined actuator torque as applied by the reference per sub-step
    (quadruped.py:288-321 applies motor torque and spring torque as two
    separate TORQUE_CONTROL calls — physically their sum).

    Returns (tau_total, tau_motor_observed, tau_spring).
    """
    kp = cfg.motor_kp if kp is None else kp
    kd = cfg.motor_kd if kd is None else kd
    tau_m = pd_torque(q_des, q, qd, kp, kd, cfg.torque_limits)
    if cfg.enable_springs:
        sk = cfg.spring_stiffness if spring_k is None else spring_k
        sd = cfg.spring_damping if spring_d is None else spring_d
        sr = cfg.spring_rest_angles if spring_rest is None else spring_rest
        tau_s = spring_torque(q, qd, sk, sd, sr)
    else:
        tau_s = jnp.zeros_like(tau_m)
    return tau_m + tau_s, tau_m, tau_s
