"""Control-interface utilities — env/control_interface/utils.py equivalents.

The reference's temporary_switch_motor_control_mode decorator (:7-19)
mutates the robot object; here the same capability is a pure call — the
functional env already takes per-call kp/kd overrides (env.step(..., kp,
kd)) and settle_robot_by_pd is a pure settling rollout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from quadruped_springs_tpu.models import kinematics as kin
from quadruped_springs_tpu.models.go1_params import (
    NUM_LEGS,
    THIGH_LINK_LENGTH,
    X_OFFSET,
    Go1Config,
)


def find_config_from_height(des_height: jnp.ndarray | float) -> jnp.ndarray:
    """Joint config putting the base at des_height with feet under hips
    (control_interface/utils.py:33-40): q = [0, arccos(h/2L), -2·q_thigh]·4.
    """
    q_thigh = jnp.arccos(jnp.asarray(des_height) / (2 * THIGH_LINK_LENGTH))
    q = jnp.stack([jnp.zeros_like(q_thigh), q_thigh, -2.0 * q_thigh])
    return jnp.tile(q, NUM_LEGS)


def des_feet_pos_from_pitch(phi_des, feet_pos: jnp.ndarray) -> jnp.ndarray:
    """Desired leg-frame foot positions producing base pitch phi_des while
    feet stay on the ground (compute_des_feet_cartesian_pos, utils.py:87-95).

    Args:
      phi_des: desired pitch angle (rad).
      feet_pos: (12,) current leg-frame foot positions (FR,FL,RR,RL xyz).
    """
    r = X_OFFSET
    c, s = jnp.cos(phi_des), jnp.sin(phi_des)
    front = jnp.stack([r - r * c, jnp.zeros_like(c), r * s])
    rear = jnp.stack([-r + r * c, jnp.zeros_like(c), -r * s])
    delta = jnp.concatenate([front, front, rear, rear])
    return delta + feet_pos


def pose_from_pitch(phi_des, q: jnp.ndarray) -> jnp.ndarray:
    """Joint angles giving base pitch phi_des from the nominal stance
    (get_pose_from_phi_des, utils.py:70-84): desired foot targets → IK.

    Args:
      q: (12,) current joint angles (defines the current foot positions).
    """
    feet_pos = kin.foot_position(q.reshape(4, 3)).reshape(12)
    des = des_feet_pos_from_pitch(phi_des, feet_pos)
    return kin.inverse_kinematics(des.reshape(4, 3)).reshape(12)


def settle_robot_by_pd(env, key: jax.Array, steps: int = 1500,
                       kp=None, kd=None):
    """Joint-PD settle to the init pose regardless of the env's motor mode
    (settle_robot_by_pd, utils.py:22-30) — a pure rollout returning the
    settled EnvState. Works for TORQUE-mode envs via the kp/kd override
    path (the functional analog of the temporary-PD-switch decorator).
    """
    from quadruped_springs_tpu.env import randomizers as rnd
    from quadruped_springs_tpu.models import dynamics as dyn
    from quadruped_springs_tpu.ops import actuation as act

    state, obs = env.reset(key)
    cfg = env.cfg
    kp = cfg.motor_kp if kp is None else kp
    kd = cfg.motor_kd if kd is None else kd
    model = rnd.model_from_params(state.scenario)
    params = env._scenario_sim_params(state.scenario)
    q_des = cfg.init_joint_angles

    def substep(carry, _):
        robot, anchor = carry
        tau = act.pd_torque(q_des, robot.q, robot.qd, kp, kd,
                            cfg.torque_limits)
        if cfg.enable_springs:
            tau = tau + act.spring_torque(
                robot.q, robot.qd, state.scenario.spring_stiffness,
                state.scenario.spring_damping, cfg.spring_rest_angles)
        robot2, info = dyn.step(model, params, robot, tau,
                                cfg.velocity_limits, foot_anchor=anchor)
        return (robot2, info["new_anchor"]), None

    (robot, anchor), _ = jax.lax.scan(
        substep, (state.robot, state.foot_anchor), None, length=steps)
    return state.replace(robot=robot, foot_anchor=anchor)
