"""Control interfaces: policy action [-1,1]^d ↔ motor command, as pure fns.

TPU-native re-design of env/control_interface/* :
  * linear scaling helpers (interface_base.py:84-100)
  * motor interfaces PD / CARTESIAN_PD / TORQUE (motor_interface.py):
      - PD: command = joint angles within the RL range; BACKFLIP task raises
        the rear-thigh upper limits to π/2 (motor_interface.py:20-22)
      - CARTESIAN_PD: command = foot xyz per leg, scaled then IK'd to joint
        angles (motor_interface.py:70-80); robot-level mode is still PD
      - TORQUE: raw torques within ±limits (motor_interface.py:91-100)
  * action-space wrappers DEFAULT(12) / SYMMETRIC(6) / SYMMETRIC_NO_HIP(4)
    (action_interface.py): SYMMETRIC mirrors FR→FL and RR→RL negating the
    `symm_idx` component (hip for PD, foot-y for Cartesian).

The interface is a small pytree of limits + static strings; every transform
is a jit/vmap-friendly pure function.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from quadruped_springs_tpu.models import kinematics as kin
from quadruped_springs_tpu.models.go1_params import NUM_MOTORS, Go1Config

MOTOR_MODES = ("PD", "CARTESIAN_PD", "TORQUE")
ACTION_MODES = ("DEFAULT", "SYMMETRIC", "SYMMETRIC_NO_HIP")


@struct.dataclass
class ControlInterface:
    motor_control_mode: str = struct.field(pytree_node=False)
    action_space_mode: str = struct.field(pytree_node=False)
    action_dim: int = struct.field(pytree_node=False)
    symm_idx: int = struct.field(pytree_node=False)
    lower_lim: jnp.ndarray       # (12,) command-space lower bound
    upper_lim: jnp.ndarray       # (12,)
    init_pose: jnp.ndarray       # (12,) command-space init reference
    settling_pose: jnp.ndarray   # (12,)
    landing_pose: jnp.ndarray    # (12,)


def make_interface(cfg: Go1Config, motor_control_mode: str = "PD",
                   action_space_mode: str = "SYMMETRIC",
                   task_env: str = "NO_TASK") -> ControlInterface:
    if motor_control_mode not in MOTOR_MODES:
        raise ValueError(f"unknown motor control mode {motor_control_mode}")
    if action_space_mode not in ACTION_MODES:
        raise ValueError(f"unknown action space mode {action_space_mode}")

    if motor_control_mode == "PD":
        lower = cfg.rl_lower_angle_joint
        upper = cfg.rl_upper_angle_joint
        if task_env == "BACKFLIP":
            # raise rear-thigh upper limits (indices 7: RR, 10: RL)
            upper = upper.at[jnp.array([7, 10])].set(jnp.pi / 2)
        init, settling, landing = (
            cfg.init_joint_angles, cfg.angle_settling_pose, cfg.angle_landing_pose
        )
        symm_idx = 0
    elif motor_control_mode == "CARTESIAN_PD":
        lower = cfg.rl_lower_cartesian_pos
        upper = cfg.rl_upper_cartesian_pos
        init, settling, landing = (
            cfg.nominal_foot_pos, cfg.cartesian_settling_pose, cfg.cartesian_landing_pose
        )
        symm_idx = 1
    else:  # TORQUE
        lower = -cfg.torque_limits
        upper = cfg.torque_limits
        init = jnp.zeros(NUM_MOTORS)
        settling = landing = init
        symm_idx = 0

    dims = {"DEFAULT": 12, "SYMMETRIC": 6, "SYMMETRIC_NO_HIP": 4}
    return ControlInterface(
        motor_control_mode=motor_control_mode,
        action_space_mode=action_space_mode,
        action_dim=dims[action_space_mode],
        symm_idx=symm_idx,
        lower_lim=lower,
        upper_lim=upper,
        init_pose=init,
        settling_pose=settling,
        landing_pose=landing,
    )


# ---------------------------------------------------------------------------
# scaling helpers (interface_base.py:84-100)
# ---------------------------------------------------------------------------

def scale_action_to_command(iface: ControlInterface, a12):
    a = jnp.clip(a12, -1.0, 1.0)
    cmd = iface.lower_lim + 0.5 * (a + 1.0) * (iface.upper_lim - iface.lower_lim)
    return jnp.clip(cmd, iface.lower_lim, iface.upper_lim)


def scale_command_to_action(iface: ControlInterface, cmd):
    c = jnp.clip(cmd, iface.lower_lim, iface.upper_lim)
    a = -1.0 + 2.0 * (c - iface.lower_lim) / (iface.upper_lim - iface.lower_lim)
    return jnp.clip(a, -1.0, 1.0)


# ---------------------------------------------------------------------------
# action-space expansion / contraction (action_interface.py)
# ---------------------------------------------------------------------------

def expand_action(iface: ControlInterface, action):
    """(action_dim,) -> (12,) default action."""
    mode = iface.action_space_mode
    if mode == "DEFAULT":
        return action
    mirror = jnp.ones(3).at[iface.symm_idx].set(-1.0)
    if mode == "SYMMETRIC":
        fr, rr = action[0:3], action[3:6]
        return jnp.concatenate([fr, fr * mirror, rr, rr * mirror])
    # SYMMETRIC_NO_HIP: insert 0 at symm_idx, same action left/right
    fr2, rr2 = action[0:2], action[2:4]
    def ins(v):
        return jnp.insert(v, iface.symm_idx, 0.0)
    fr = ins(fr2)
    rr = ins(rr2)
    return jnp.concatenate([fr, fr, rr, rr])


def contract_action(iface: ControlInterface, action12):
    """(12,) -> (action_dim,) (action_interface.py _convert_to_actual_*)."""
    mode = iface.action_space_mode
    if mode == "DEFAULT":
        return action12
    fr, rr = action12[0:3], action12[6:9]
    if mode == "SYMMETRIC":
        return jnp.concatenate([fr, rr])
    keep = jnp.array([i for i in range(3) if i != iface.symm_idx])
    return jnp.concatenate([fr[keep], rr[keep]])


# ---------------------------------------------------------------------------
# full transforms (ActionWrapperBase._transform_* composition)
# ---------------------------------------------------------------------------

def action_to_command(iface: ControlInterface, action):
    """Policy action (action_dim,) -> motor command (12,).

    For PD the command is desired joint angles; for CARTESIAN_PD the scaled
    foot targets are converted through the analytic IK; for TORQUE it's raw
    torque.
    """
    a12 = expand_action(iface, action)
    cmd = scale_action_to_command(iface, a12)
    if iface.motor_control_mode == "CARTESIAN_PD":
        cmd = kin.inverse_kinematics_flat(cmd)
    return cmd


def action_to_robot_command(iface: ControlInterface, action):
    """Like action_to_command but always returns the robot-level command
    (joint angles for PD/CARTESIAN_PD, torques for TORQUE)."""
    return action_to_command(iface, action)


def command_to_action(iface: ControlInterface, command):
    """Motor command (12,) in *interface* space -> policy action.

    Note: for CARTESIAN_PD the command here is foot positions (the
    reference's _transform_motor_command_to_action also takes the cartesian
    command, motor_interface.py:82-84).
    """
    return contract_action(iface, scale_command_to_action(iface, command))


def reference_to_command(iface: ControlInterface, reference):
    """Project a reference pose onto the achievable command set
    (interface_base.py:69-73 _convert_reference_to_command)."""
    a = command_to_action(iface, reference)
    return action_to_command(iface, a)


def init_action(iface: ControlInterface):
    """Action that pushes the robot toward the init pose."""
    return command_to_action(iface, iface.init_pose)


def landing_action(iface: ControlInterface):
    return command_to_action(iface, iface.landing_pose)


def settling_action(iface: ControlInterface):
    return command_to_action(iface, iface.settling_pose)
