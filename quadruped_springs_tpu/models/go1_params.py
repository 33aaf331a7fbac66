"""Unitree Go1 model data: URDF-derived rigid-body constants + robot config.

This module is the TPU-native equivalent of the reference's
``go1/go1.urdf`` + ``go1/configs_go1_with_springs.py`` /
``configs_go1_without_springs.py`` (file:line cites below): every numeric
constant used by the simulator, the controller interfaces and the tasks is
transcribed here as literals, assembled into jnp pytrees by ``build_model``.

Leg order everywhere: FR, FL, RR, RL  (matches reference quadruped.py).
Joint order per leg: hip(x-axis), thigh(y-axis), calf(y-axis).

Sources (reference @ /root/reference/quadruped_spring):
  * go1/go1_description/urdf/go1.urdf — masses, COMs, inertias, joint origins
    (trunk:80-85, hips:112-137/272-297/432-..., thighs:164-189, calves:191-216,
     feet:218-240; collision sphere r=0.02 at urdf:231-235)
  * go1/configs_go1_with_springs.py — all gains/limits/poses (cited per field)
  * go1/configs_go1_without_springs.py — no-spring variants
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct

from quadruped_springs_tpu.models import spatial

# ---------------------------------------------------------------------------
# Structure constants
# ---------------------------------------------------------------------------
NUM_MOTORS = 12
NUM_LEGS = 4
MOTORS_PER_LEG = 3
LEG_NAMES = ("FR", "FL", "RR", "RL")
# +1 for left-side legs, -1 for right-side legs (y sign). configs:70, quadruped.py:360
SIDE_SIGN = np.array([-1.0, 1.0, -1.0, 1.0])
# +1 front, -1 rear (x sign of hip origin).
FRONT_SIGN = np.array([1.0, 1.0, -1.0, -1.0])

GRAVITY = 9.8  # quadruped_gym_env.py:309 setGravity(0,0,-9.8)

# ---------------------------------------------------------------------------
# Kinematic constants (configs_go1_with_springs.py:56-74)
# ---------------------------------------------------------------------------
HIP_LINK_LENGTH = 0.0847     # analytic leg-frame hip length (configs:56)
THIGH_LINK_LENGTH = 0.213
CALF_LINK_LENGTH = 0.213
X_OFFSET = 0.1881            # hip joint x offset from trunk (configs:60, urdf:113)
Y_OFFSET = 0.04675           # hip joint y offset (configs:61)
THIGH_Y_OFFSET = 0.08        # thigh joint lateral offset from hip (urdf:165)
FOOT_RADIUS = 0.02           # collision sphere (urdf:231-235)

# ---------------------------------------------------------------------------
# URDF inertial literals (go1.urdf). COM and inertia in the link's own frame.
# ---------------------------------------------------------------------------
BASE_MASS = 1e-5
BASE_INERTIA_DIAG = 1e-5
TRUNK_MASS = 5.204
TRUNK_COM = (0.0223, 0.000, -0.0005)
TRUNK_INERTIA = (0.0168352186, 0.0004636141, 0.0002367952,
                 0.0656071082, 3.6671e-05, 0.0742720659)  # ixx ixy ixz iyy iyz izz
IMU_MASS = 0.001
IMU_OFFSET = (-0.01592, -0.06659, -0.00617)  # urdf:90 imu_joint origin
IMU_INERTIA_DIAG = 0.0001

HIP_MASS = 0.591
HIP_COM_ABS = (0.00541, 0.00074, 6e-06)      # signs per leg below
HIP_INERTIA_ABS = (0.000374268192, 3.6844422e-05, 9.86754e-07,
                   0.000635923669, 1.172894e-06, 0.000457647394)

THIGH_MASS = 0.92
THIGH_COM_ABS = (-0.003468, 0.018947, -0.032736)  # y mirrored left/right
THIGH_INERTIA_ABS = (0.005851561134, 1.783284e-06, 0.000328291374,
                     0.005596155105, 2.1430713e-05, 0.00107157026)

CALF_MASS = 0.131
CALF_COM = (0.006286, 0.001307, -0.122269)   # identical on all four legs
CALF_INERTIA = (0.002939186297, 1.440899e-06, -0.00010535955,
                0.00295576935, -2.4397752e-05, 3.0273372e-05)

FOOT_MASS = 0.06
FOOT_INERTIA_DIAG = 9.6e-06
FOOT_OFFSET_IN_CALF = (0.0, 0.0, -0.213)     # urdf FR_foot_fixed:219


def _inertia_mat(ixx, ixy, ixz, iyy, iyz, izz):
    return np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])


def _mirror(inertia6, com, sx, sy):
    """Mirror an inertial block across x (sx=-1) and/or y (sy=-1) planes.

    Reflection flips the COM component and the inertia products involving the
    reflected axis; this reproduces the per-leg sign patterns in go1.urdf
    (verified against all 4 hips/thighs).
    """
    ixx, ixy, ixz, iyy, iyz, izz = inertia6
    cx, cy, cz = com
    com_m = (sx * cx, sy * cy, cz)
    i_m = (ixx, sx * sy * ixy, sx * ixz, iyy, sy * iyz, izz)
    return i_m, com_m


# FR hip is the URDF literal; others are mirrors. FR: com(-0.00541,+0.00074,..),
# ixy=-3.6844422e-05, ixz=-9.86754e-07, iyz=+1.172894e-06 (urdf:134-136).
_FR_HIP_COM = (-HIP_COM_ABS[0], +HIP_COM_ABS[1], HIP_COM_ABS[2])
_FR_HIP_I = (HIP_INERTIA_ABS[0], -HIP_INERTIA_ABS[1], -HIP_INERTIA_ABS[2],
             HIP_INERTIA_ABS[3], +HIP_INERTIA_ABS[4], HIP_INERTIA_ABS[5])
# FR thigh literal (urdf:186-188): com y>0, ixy<0, iyz<0.
_FR_THIGH_COM = THIGH_COM_ABS
_FR_THIGH_I = (THIGH_INERTIA_ABS[0], -THIGH_INERTIA_ABS[1], +THIGH_INERTIA_ABS[2],
               THIGH_INERTIA_ABS[3], -THIGH_INERTIA_ABS[4], THIGH_INERTIA_ABS[5])


def _leg_inertials():
    """Return (coms, inertias) arrays shaped (4 legs, 3 bodies, ...)."""
    coms = np.zeros((NUM_LEGS, 3, 3))
    inertias = np.zeros((NUM_LEGS, 3, 3, 3))
    for leg in range(NUM_LEGS):
        # Mirror FR across x for rear legs (sx=-1) and across y for left (sy=+1
        # means mirror since FR is a right leg).
        sx = FRONT_SIGN[leg]
        sy = -SIDE_SIGN[leg]  # +1 keeps FR pattern (right), -1 mirrors to left
        hip_i, hip_c = _mirror(_FR_HIP_I, _FR_HIP_COM, sx, sy)
        thigh_i, thigh_c = _mirror(_FR_THIGH_I, _FR_THIGH_COM, 1.0, sy)
        coms[leg, 0] = hip_c
        coms[leg, 1] = thigh_c
        coms[leg, 2] = CALF_COM
        inertias[leg, 0] = _inertia_mat(*hip_i)
        inertias[leg, 1] = _inertia_mat(*thigh_i)
        inertias[leg, 2] = _inertia_mat(*CALF_INERTIA)
    return coms, inertias


LEG_COMS, LEG_INERTIAS = _leg_inertials()
LEG_MASSES = np.array([HIP_MASS, THIGH_MASS, CALF_MASS])  # per-leg bodies

# Joint frame origins in parent frame (urdf joint origins).
HIP_ORIGINS = np.stack(
    [FRONT_SIGN * X_OFFSET, SIDE_SIGN * Y_OFFSET, np.zeros(4)], axis=-1
)  # (4,3) in trunk frame
THIGH_ORIGINS = np.stack(
    [np.zeros(4), SIDE_SIGN * THIGH_Y_OFFSET, np.zeros(4)], axis=-1
)  # (4,3) in hip frame
CALF_ORIGIN = np.array([0.0, 0.0, -THIGH_LINK_LENGTH])  # in thigh frame
FOOT_ORIGIN = np.array(FOOT_OFFSET_IN_CALF)             # in calf frame

# Joint axes per joint-in-leg: hip about x, thigh/calf about y (urdf:116,168,195)
JOINT_AXES = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])


# ---------------------------------------------------------------------------
# Robot configuration (the two config modules, selected by enable_springs)
# ---------------------------------------------------------------------------

@struct.dataclass
class Go1Config:
    """All robot-level constants; fields mirror the reference config modules.

    Static python floats/bools are marked pytree_node=False; per-motor arrays
    are jnp so they can be donated/randomized per scenario.
    """
    enable_springs: bool = struct.field(pytree_node=False)

    # poses / init (configs_go1_with_springs.py:22-42,63-74)
    init_position: jnp.ndarray          # (3,)
    init_joint_angles: jnp.ndarray      # (12,)
    angle_settling_pose: jnp.ndarray    # (12,)
    angle_landing_pose: jnp.ndarray     # (12,)
    nominal_foot_pos: jnp.ndarray       # (12,) leg frame
    cartesian_settling_pose: jnp.ndarray
    cartesian_landing_pose: jnp.ndarray
    is_fallen_height: float = struct.field(pytree_node=False)
    init_height: float = struct.field(pytree_node=False)  # configs:74

    # RL ranges (configs:80-103)
    rl_upper_angle_joint: jnp.ndarray   # (12,)
    rl_lower_angle_joint: jnp.ndarray
    rl_upper_cartesian_pos: jnp.ndarray
    rl_lower_cartesian_pos: jnp.ndarray
    torque_limits: jnp.ndarray          # (12,)
    velocity_limits: jnp.ndarray        # (12,)
    rl_velocity_limits: jnp.ndarray     # (12,) obs-noise scale

    # gains (configs:106-114)
    motor_kp: jnp.ndarray               # (12,)
    motor_kd: jnp.ndarray               # (12,)
    kp_cartesian: jnp.ndarray           # (3,3)
    kd_cartesian: jnp.ndarray           # (3,3)

    # springs (configs:150-160); zeros when springs disabled
    spring_stiffness: jnp.ndarray       # (3,) hip/thigh/calf
    spring_damping: jnp.ndarray         # (3,)
    spring_rest_angles: jnp.ndarray     # (3,)

    # action clipping (configs:169-170)
    max_motor_angle_change_per_step: float = struct.field(pytree_node=False)
    max_cartesian_change_per_step: jnp.ndarray = None  # (3,)


_DEFAULT_HIP = 0.0
_DEFAULT_THIGH = np.pi / 4
_DEFAULT_CALF = -np.pi / 2
_INIT_ANGLES = np.array([_DEFAULT_HIP, _DEFAULT_THIGH, _DEFAULT_CALF] * NUM_LEGS)
_DEFAULT_Y = HIP_LINK_LENGTH
_NOMINAL_FOOT = np.array(
    [[0.0, s * _DEFAULT_Y, -0.32] for s in SIDE_SIGN]
).flatten()
_CART_LANDING = np.array(
    [[0.0, s * _DEFAULT_Y, -0.29] for s in SIDE_SIGN]
).flatten()
_CART_SETTLING = np.array(
    [[-0.02, s * _DEFAULT_Y, -0.15] for s in SIDE_SIGN]
).flatten()


def go1_config(enable_springs: bool = True) -> Go1Config:
    """Build the robot config; mirrors configs_go1_with(out)_springs.py."""
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    if enable_springs:
        calf_lower = -2.5      # with_springs:86
        kp = [75.0, 75.0, 75.0]
        kd = [0.8, 1.0, 1.0]
        kp_cart = np.diag([1200.0, 2000.0, 2000.0])
        kd_cart = np.diag([13.0, 15.0, 15.0])
        settling = np.array([0.0, 1.14, -2.5] * NUM_LEGS)      # with_springs:39
        is_fallen_h = 0.10
        cart_up_z = 0.18                                        # with_springs:91
        spring_k = [20.0, 20.0, 30.0]                           # :150-158
        spring_d = [0.3, 0.3, 0.3]
        spring_rest = [_DEFAULT_HIP, _DEFAULT_THIGH, _DEFAULT_CALF + 0.3]
    else:
        calf_lower = -2.12     # without_springs:82
        kp = [55.0, 60.0, 60.0]                                 # :108
        kd = [0.8, 1.0, 1.0]
        kp_cart = np.diag([500.0, 500.0, 500.0])                # :112
        kd_cart = np.diag([10.0, 10.0, 10.0])
        settling = np.array([0.0, 1.14, -2.19] * NUM_LEGS)      # :38
        is_fallen_h = 0.12
        cart_up_z = 0.11                                        # :87
        spring_k = [0.0, 0.0, 0.0]
        spring_d = [0.0, 0.0, 0.0]
        spring_rest = [_DEFAULT_HIP, _DEFAULT_THIGH, _DEFAULT_CALF + 0.3]

    rl_upper = np.array([0.2, _DEFAULT_THIGH + 0.5, -0.95] * NUM_LEGS)
    rl_lower = np.array([-0.2, _DEFAULT_THIGH - 0.5, calf_lower] * NUM_LEGS)
    cart_delta_up = np.array([0.2, 0.05, cart_up_z] * NUM_LEGS)
    cart_delta_lo = np.array([0.2, 0.05, 0.07] * NUM_LEGS)

    return Go1Config(
        enable_springs=enable_springs,
        init_position=f32([0.0, 0.0, 0.32]),
        init_joint_angles=f32(_INIT_ANGLES),
        angle_settling_pose=f32(settling),
        angle_landing_pose=f32(_INIT_ANGLES),  # ANGLE_LANDING_POSE = INIT (configs:38)
        nominal_foot_pos=f32(_NOMINAL_FOOT),
        cartesian_settling_pose=f32(_CART_SETTLING),
        cartesian_landing_pose=f32(_CART_LANDING),
        is_fallen_height=is_fallen_h,
        init_height=0.35,
        rl_upper_angle_joint=f32(rl_upper),
        rl_lower_angle_joint=f32(rl_lower),
        rl_upper_cartesian_pos=f32(_NOMINAL_FOOT + cart_delta_up),
        rl_lower_cartesian_pos=f32(_NOMINAL_FOOT - cart_delta_lo),
        torque_limits=f32([23.7, 23.7, 33.55] * NUM_LEGS),
        velocity_limits=f32([30.1] * NUM_MOTORS),
        rl_velocity_limits=f32([10.0] * NUM_MOTORS),
        motor_kp=f32(kp * NUM_LEGS),
        motor_kd=f32(kd * NUM_LEGS),
        kp_cartesian=f32(kp_cart),
        kd_cartesian=f32(kd_cart),
        spring_stiffness=f32(spring_k),
        spring_damping=f32(spring_d),
        spring_rest_angles=f32(spring_rest),
        max_motor_angle_change_per_step=0.2,
        max_cartesian_change_per_step=f32([0.1, 0.02, 0.08]),
    )


# ---------------------------------------------------------------------------
# Dynamics model assembly
# ---------------------------------------------------------------------------

@struct.dataclass
class Go1Model:
    """Rigid-body model pytree consumed by dynamics.py.

    The trunk body merges base + trunk + imu (all connected by fixed joints);
    each leg is a 3-body serial chain (hip, thigh, calf+foot merged).
    Everything is a jnp array so scenario randomization is a pure pytree map.
    """
    trunk_inertia6: jnp.ndarray   # (6,6) spatial inertia about base frame origin
    trunk_mass: jnp.ndarray       # ()
    leg_masses: jnp.ndarray       # (4,3)
    leg_coms: jnp.ndarray         # (4,3,3) COM in own link frame
    leg_inertias6: jnp.ndarray    # (4,3,6,6) spatial inertia about link frame
    hip_origins: jnp.ndarray      # (4,3)
    thigh_origins: jnp.ndarray    # (4,3)
    calf_origin: jnp.ndarray      # (3,)
    foot_origin: jnp.ndarray      # (3,) in calf frame
    joint_axes: jnp.ndarray       # (3,3)
    gravity: jnp.ndarray          # (3,)
    foot_radius: float = struct.field(pytree_node=False)


def _merge_point_mass(I6, mass6_about_origin):
    return I6 + mass6_about_origin


def build_model(
    leg_masses: jnp.ndarray | None = None,
    foot_masses: jnp.ndarray | None = None,
    base_mass: jnp.ndarray | None = None,
    offset_mass: jnp.ndarray | None = None,
    offset_pos: jnp.ndarray | None = None,
    dtype=jnp.float32,
) -> Go1Model:
    """Assemble the Go1Model, optionally with randomized masses.

    Args (all optional, default = URDF values; jnp scalars/arrays for vmap):
      leg_masses: (4,3) or (3,) hip/thigh/calf masses.
      foot_masses: (4,) foot masses.
      base_mass: scalar trunk mass (reference randomizer adjusts it to keep
        total constant, env_randomizer.py:61-65).
      offset_mass: scalar extra mass rigidly attached to trunk.
      offset_pos: (3,) position of the offset mass in trunk frame.
    """
    f = lambda x: jnp.asarray(x, dtype=dtype)
    if leg_masses is None:
        leg_masses = jnp.broadcast_to(f(LEG_MASSES), (NUM_LEGS, 3))
    else:
        leg_masses = jnp.broadcast_to(f(leg_masses), (NUM_LEGS, 3))
    if foot_masses is None:
        foot_masses = jnp.full((NUM_LEGS,), FOOT_MASS, dtype=dtype)
    if base_mass is None:
        base_mass = f(TRUNK_MASS)
    if offset_mass is None:
        offset_mass = f(0.0)
    if offset_pos is None:
        offset_pos = jnp.zeros(3, dtype=dtype)

    eye3 = jnp.eye(3, dtype=dtype)

    # --- trunk = base + trunk + imu (+ optional offset mass), about base origin
    trunk_I = spatial.spatial_inertia(
        base_mass, f(TRUNK_COM), f(_inertia_mat(*TRUNK_INERTIA))
    )
    base_I = spatial.spatial_inertia(
        f(BASE_MASS), jnp.zeros(3, dtype), BASE_INERTIA_DIAG * eye3
    )
    imu_I = spatial.spatial_inertia(
        f(IMU_MASS), f(IMU_OFFSET), IMU_INERTIA_DIAG * eye3
    )
    off_I = spatial.spatial_inertia(offset_mass, offset_pos, jnp.zeros((3, 3), dtype))
    trunk_inertia6 = trunk_I + base_I + imu_I + off_I
    trunk_mass = base_mass + BASE_MASS + IMU_MASS + offset_mass

    # --- legs: merge foot (point at FOOT_ORIGIN + tiny sphere inertia) into calf
    leg_coms = f(LEG_COMS)
    leg_I6 = spatial.spatial_inertia(
        leg_masses, leg_coms, f(LEG_INERTIAS)
    )  # (4,3,6,6) inertia of hip/thigh/calf about their own frames
    foot_I6 = spatial.spatial_inertia(
        foot_masses, jnp.broadcast_to(f(FOOT_ORIGIN), (NUM_LEGS, 3)),
        FOOT_INERTIA_DIAG * jnp.broadcast_to(eye3, (NUM_LEGS, 3, 3)),
    )  # (4,6,6) about calf frame
    leg_inertias6 = leg_I6.at[:, 2].add(foot_I6)
    leg_masses_merged = leg_masses.at[:, 2].add(foot_masses)
    # COM bookkeeping for the merged calf body (used in tests / energy calcs).
    calf_com = (
        leg_masses[:, 2:3] * leg_coms[:, 2]
        + foot_masses[:, None] * f(FOOT_ORIGIN)
    ) / leg_masses_merged[:, 2:3]
    leg_coms = leg_coms.at[:, 2].set(calf_com)

    return Go1Model(
        trunk_inertia6=trunk_inertia6,
        trunk_mass=trunk_mass,
        leg_masses=leg_masses_merged,
        leg_coms=leg_coms,
        leg_inertias6=leg_inertias6,
        hip_origins=f(HIP_ORIGINS),
        thigh_origins=f(THIGH_ORIGINS),
        calf_origin=f(CALF_ORIGIN),
        foot_origin=f(FOOT_ORIGIN),
        joint_axes=f(JOINT_AXES),
        gravity=f([0.0, 0.0, -GRAVITY]),
        foot_radius=FOOT_RADIUS,
    )


def total_mass(model: Go1Model) -> jnp.ndarray:
    return model.trunk_mass + jnp.sum(model.leg_masses)
