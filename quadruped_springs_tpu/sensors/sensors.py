"""Sensors (observation space) as pure functions over the sim state.

TPU-native re-design of env/sensors/* : each sensor is a (name, read fn,
limits fn) triple; a suite is an ordered tuple of sensors. Readings come
from a `SensorContext` pytree assembled once per control step (so all
sensors share one FK evaluation), Gaussian noise is sampled with an explicit
PRNG key (reference samples np.random.normal per step, sensor.py:25-32).

Sensor inventory mirrors robot_sensors.py:
  BooleanContact, Height, JointPosition, JointVelocity, FeetPosition,
  FeetVelocity, LinearVelocity, Landing, Jumping, VelocityX,
  AngularVelocity, Quaternion, Pitch, PitchRate, OrientationRPY,
  BaseHeightVelocity, PitchBackFlip.

Suites mirror sensor_collection.py:92-105 (12 named suites).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct

from quadruped_springs_tpu.models import kinematics as kin
from quadruped_springs_tpu.models import spatial as sp
from quadruped_springs_tpu.models.go1_params import NUM_LEGS, NUM_MOTORS, Go1Config

STD_COEFF = 0.01  # configs:215


@struct.dataclass
class SensorContext:
    """Everything any sensor can read, assembled once per control step."""
    pos: jnp.ndarray            # (3,) base position, world
    quat: jnp.ndarray           # (4,) xyzw
    lin_vel: jnp.ndarray        # (3,) world
    ang_vel: jnp.ndarray        # (3,) world
    q: jnp.ndarray              # (12,)
    qd: jnp.ndarray             # (12,)
    feet_contact: jnp.ndarray   # (4,) bool
    feet_pos: jnp.ndarray       # (12,) leg frame (analytic kinematics)
    feet_vel: jnp.ndarray       # (12,)
    switched_controller: jnp.ndarray  # () bool — task landing flag
    is_jumping: jnp.ndarray     # () bool — continuous-jumping flag


def make_context(state, feet_contact, switched_controller=None, is_jumping=None):
    """Build a SensorContext from a dynamics RobotState + contact bools."""
    fp, fv = kin.foot_pos_and_vel(state.q, state.qd)
    false = jnp.asarray(False)
    return SensorContext(
        pos=state.pos, quat=state.quat, lin_vel=state.lin_vel,
        ang_vel=state.ang_vel, q=state.q, qd=state.qd,
        feet_contact=feet_contact, feet_pos=fp, feet_vel=fv,
        switched_controller=false if switched_controller is None else switched_controller,
        is_jumping=false if is_jumping is None else is_jumping,
    )


@dataclasses.dataclass(frozen=True)
class SensorSpec:
    name: str
    dim: int
    read: Callable[[SensorContext], jnp.ndarray]
    limits: Callable[[Go1Config], tuple]  # -> (high, low, noise_std)


def _arr(x):
    return jnp.atleast_1d(jnp.asarray(x))


# --- limit tables (configs_go1_with_springs.py:176-230) --------------------

def _height_limits(cfg):
    return _arr(0.4), _arr(0.1), _arr(0.4 * STD_COEFF * 0.8)


def _joint_pos_limits(cfg):
    hi, lo = cfg.rl_upper_angle_joint, cfg.rl_lower_angle_joint
    noise = jnp.maximum(jnp.abs(hi), jnp.abs(lo)) * STD_COEFF * 0.1
    return hi, lo, noise


def _joint_vel_limits(cfg):
    hi = cfg.rl_velocity_limits
    return hi, -hi, hi * STD_COEFF * 0.6


def _feet_pos_limits(cfg):
    hi, lo = cfg.rl_upper_cartesian_pos, cfg.rl_lower_cartesian_pos
    noise = jnp.tile(jnp.array([0.1, 0.05, 0.1]), NUM_LEGS) * STD_COEFF
    return hi, lo, noise


def _feet_vel_limits(cfg):
    hi = jnp.full(NUM_MOTORS, 10.0)
    # reference quirk: FEET_VEL_LOW = -FEET_POS_HIGH (configs:206)
    return hi, -cfg.rl_upper_cartesian_pos, hi * STD_COEFF


def _lin_vel_limits(cfg):
    hi = jnp.full(3, 5.0)
    return hi, -hi, hi * STD_COEFF * 0.8


def _ang_vel_limits(cfg):
    hi = jnp.full(3, 3.0)
    return hi, -hi, hi * STD_COEFF


def _quat_limits(cfg):
    one = jnp.ones(4)
    return one, jnp.zeros(4), one * STD_COEFF


def _pitch_limits(cfg):
    hi = _arr(jnp.pi)
    return hi, -hi, hi * STD_COEFF * 0.9


def _pitch_rate_limits(cfg):
    hi = _arr(5.0)
    return hi, -hi, hi * STD_COEFF


def _rpy_limits(cfg):
    hi = jnp.full(3, jnp.pi)
    return hi, -hi, hi * STD_COEFF


def _flag_limits(cfg):
    return _arr(1.0), _arr(0.0), _arr(0.0)


def _contact_limits(cfg):
    one = jnp.ones(NUM_LEGS)
    return one, jnp.zeros(NUM_LEGS), jnp.zeros(NUM_LEGS)


def _vel_x_limits(cfg):
    return _arr(5.0), _arr(-5.0), _arr(5.0 * STD_COEFF * 0.8)


def _vel_z_limits(cfg):
    return _arr(5.0), _arr(-5.0), _arr(5.0 * STD_COEFF * 0.8)


# --- sensor registry --------------------------------------------------------

SENSORS = {
    "BooleanContact": SensorSpec(
        "BoolContatc", NUM_LEGS,  # name string kept for obs-dict parity
        lambda c: c.feet_contact.astype(jnp.float32), _contact_limits),
    "Height": SensorSpec("Height", 1, lambda c: _arr(c.pos[2]), _height_limits),
    "JointPosition": SensorSpec("Encoder", 12, lambda c: c.q, _joint_pos_limits),
    "JointVelocity": SensorSpec("JointVelocity", 12, lambda c: c.qd, _joint_vel_limits),
    "FeetPosition": SensorSpec("FeetPosition", 12, lambda c: c.feet_pos, _feet_pos_limits),
    "FeetVelocity": SensorSpec("FeetVelocity", 12, lambda c: c.feet_vel, _feet_vel_limits),
    "LinearVelocity": SensorSpec(
        "Base Linear Velocity", 3, lambda c: c.lin_vel, _lin_vel_limits),
    "AngularVelocity": SensorSpec(
        "Base Angular Velocity", 3, lambda c: c.ang_vel, _ang_vel_limits),
    "Quaternion": SensorSpec("Quaternion", 4, lambda c: c.quat, _quat_limits),
    "Pitch": SensorSpec(
        "Pitch", 1, lambda c: _arr(sp.quat_to_rpy(c.quat)[1]), _pitch_limits),
    "PitchRate": SensorSpec(
        # body-frame pitch rate (GetTrueBaseRollPitchYawRate uses the base-
        # frame angular velocity, quadruped.py)
        "Pitch rate", 1,
        lambda c: _arr(sp.quat_rotate_inv(c.quat, c.ang_vel)[1]),
        _pitch_rate_limits),
    "OrientationRPY": SensorSpec(
        "Orientation Roll Pitch Yaw", 3, lambda c: sp.quat_to_rpy(c.quat), _rpy_limits),
    "VelocityX": SensorSpec(
        "Base Height Velocity X", 1, lambda c: _arr(c.lin_vel[0]), _vel_x_limits),
    "BaseHeightVelocity": SensorSpec(
        "Base Linear Velocity z direction", 1, lambda c: _arr(c.lin_vel[2]),
        _vel_z_limits),
    "Landing": SensorSpec(
        "is landing", 1,
        lambda c: _arr(c.switched_controller.astype(jnp.float32)), _flag_limits),
    "Jumping": SensorSpec(
        "is jumping", 1, lambda c: _arr(c.is_jumping.astype(jnp.float32)), _flag_limits),
    "PitchBackFlip": SensorSpec(
        "Pitch-BackFlip", 1,
        lambda c: _arr(sp.pitch_unwrapped_yxz(c.quat, c.switched_controller)),
        _pitch_limits),
}

# --- suites (sensor_collection.py:92-105) -----------------------------------

SUITES = {
    "ENCODER": ("JointPosition", "JointVelocity"),
    "ENCODER_2": ("LinearVelocity", "AngularVelocity", "JointPosition", "JointVelocity"),
    "CARTESIAN_NO_IMU": ("FeetPosition", "FeetVelocity"),
    "ARS_BASIC": ("JointPosition", "JointVelocity", "Pitch", "Height",
                  "BaseHeightVelocity"),
    "ARS_SENSOR": ("JointPosition", "JointVelocity", "Pitch", "PitchRate",
                   "Height", "BaseHeightVelocity"),
    "LANDING_SENSOR": ("JointPosition", "JointVelocity", "Pitch", "PitchRate",
                       "Height", "BaseHeightVelocity", "Landing"),
    "PPO_BASIC": ("JointPosition", "JointVelocity", "Pitch", "Height",
                  "BaseHeightVelocity", "Landing"),
    "PPO_BASIC_X": ("JointPosition", "JointVelocity", "Pitch", "Height",
                    "BaseHeightVelocity", "VelocityX", "Landing"),
    "PPO_BASIC_CONTACT": ("JointPosition", "JointVelocity", "Pitch", "Height",
                          "BaseHeightVelocity", "Landing", "BooleanContact"),
    "ARS_BACKFLIP": ("JointPosition", "JointVelocity", "Height",
                     "BaseHeightVelocity", "PitchBackFlip"),
    "PPO_BACKFLIP": ("JointPosition", "JointVelocity", "Height",
                     "BaseHeightVelocity", "PitchBackFlip", "Landing"),
    "PPO_CONTINUOUS_JUMPING_FORWARD": ("JointPosition", "JointVelocity", "Height",
                                       "BaseHeightVelocity", "Pitch", "Landing",
                                       "Jumping"),
}


def suite_specs(suite: str):
    try:
        return tuple(SENSORS[k] for k in SUITES[suite])
    except KeyError as e:
        raise KeyError(f"unknown sensor suite or sensor: {e}") from e


def obs_dim(suite: str) -> int:
    return sum(s.dim for s in suite_specs(suite))


def obs_limits(suite: str, cfg: Go1Config):
    """Concatenated (high, low, noise_std) for the suite
    (SensorList._get_high_limits, sensor.py:89-99)."""
    highs, lows, noises = [], [], []
    for s in suite_specs(suite):
        h, l, n = s.limits(cfg)
        highs.append(h)
        lows.append(l)
        noises.append(n)
    return jnp.concatenate(highs), jnp.concatenate(lows), jnp.concatenate(noises)


def read_obs(suite: str, ctx: SensorContext) -> jnp.ndarray:
    """Noise-free flat observation (SensorList.get_obs + ObsFlattening)."""
    return jnp.concatenate([s.read(ctx) for s in suite_specs(suite)])


def read_noisy_obs(suite: str, cfg: Go1Config, ctx: SensorContext,
                   key: jax.Array) -> jnp.ndarray:
    """Flat observation with per-sensor Gaussian noise.

    The reference adds noise only where noise_std > 0 (sensor.py:46-52) —
    zero-std entries pass through exactly.
    """
    clean = read_obs(suite, ctx)
    _, _, noise_std = obs_limits(suite, cfg)
    noise = jax.random.normal(key, clean.shape) * noise_std
    return clean + noise
