"""control/utils.py: height/pitch pose solvers + PD settle."""

import jax
import jax.numpy as jnp

from quadruped_springs_tpu.control import utils as cu
from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.models import kinematics as kin
from quadruped_springs_tpu.models.go1_params import go1_config


def test_find_config_from_height_geometry():
    for h in (0.20, 0.30, 0.40):
        q = cu.find_config_from_height(h)
        fp = kin.foot_position(q.reshape(4, 3))
        assert jnp.allclose(fp[:, 2], -h, atol=1e-5)
        assert jnp.allclose(q[0::3], 0.0)


def test_pose_from_pitch_tilts_feet():
    cfg = go1_config(True)
    q = cu.pose_from_pitch(0.3, cfg.init_joint_angles)
    fp = kin.foot_position(q.reshape(4, 3))
    # front and rear feet separate in z by ~2 X_OFFSET sin(phi)
    dz = float(fp[2, 2] - fp[0, 2])
    assert abs(dz + 2 * 0.1881 * jnp.sin(0.3)) < 0.02, dz
    # zero pitch is identity-ish
    q0 = cu.pose_from_pitch(0.0, cfg.init_joint_angles)
    assert jnp.allclose(q0, cfg.init_joint_angles, atol=1e-4)


def test_settle_robot_by_pd_reaches_stance():
    env = QuadrupedEnv(EnvConfig(
        enable_springs=False, task_env="NO_TASK",
        observation_space_mode="ENCODER", action_space_mode="DEFAULT",
        settling_steps=100))
    st = cu.settle_robot_by_pd(env, jax.random.PRNGKey(0), steps=1500)
    assert 0.25 < float(st.robot.pos[2]) < 0.40
    assert float(jnp.abs(st.robot.qd).max()) < 1.0
