"""Functional env tests: reset/settle, step semantics, termination,
task rewards, batching, randomization."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.env import randomizers as rnd
from quadruped_springs_tpu.models.go1_params import go1_config
from quadruped_springs_tpu.sensors import sensors as sn


from tests.conftest import env_factory

_env = env_factory(
    enable_springs=True,
    motor_control_mode="PD",
    action_space_mode="SYMMETRIC",
    task_env="JUMPING_IN_PLACE",
    observation_space_mode="ARS_BASIC",
    settling_steps=600,  # shorter settle for tests
)


def test_reset_settles_standing():
    env = _env()
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (env.obs_dim,)
    z = float(state.robot.pos[2])
    assert 0.25 < z < 0.36, f"settled at {z}"
    assert bool(jnp.all(state.feet_in_contact))
    assert not bool(state.invalid_contact)


def test_step_holds_pose_with_zero_error_action():
    """Commanding the init pose keeps the robot standing for 50 steps."""
    env = _env()
    state, _ = env.reset(jax.random.PRNGKey(0))
    a = env.get_init_action()
    for _ in range(50):
        state, obs, r, done, info = env.step(state, a)
    assert not bool(done)
    assert 0.25 < float(state.robot.pos[2]) < 0.4


def test_sim_time_and_counters():
    env = _env()
    state, _ = env.reset(jax.random.PRNGKey(1))
    assert int(state.sim_step_counter) == 0  # settle doesn't count
    state, *_ = env.step(state, env.get_init_action())
    assert int(state.sim_step_counter) == 10
    assert int(state.env_step_counter) == 1
    np.testing.assert_allclose(float(env.sim_time(state)), 0.01)


def test_episode_times_out():
    env = _env(max_ep_len=0.05)  # 5 control steps
    state, _ = env.reset(jax.random.PRNGKey(2))
    a = env.get_init_action()
    done = False
    for i in range(10):
        state, obs, r, done, info = env.step(state, a)
        if bool(done):
            break
    assert bool(done)
    assert bool(info["timeout"])
    assert i == 5  # time > max_ep_len strictly (quadruped_gym_env.py:245)


def test_sparse_task_reward_only_at_end():
    env = _env(task_env="JUMPING_IN_PLACE", max_ep_len=0.05)
    state, _ = env.reset(jax.random.PRNGKey(3))
    a = env.get_init_action()
    rewards = []
    done = False
    while not done:
        state, obs, r, done, info = env.step(state, a)
        rewards.append(float(r))
    assert all(r == 0.0 for r in rewards[:-1])
    # standing still, not fallen: alive bonus only (h_norm=0 -> 0.1*0=0...)
    # reward = 0.7*0 + 0 + 0.05*0*... + 0.1*0 = small nonneg
    assert rewards[-1] >= 0.0


def test_ppo_task_dense_reward():
    env = _env(task_env="JUMPING_IN_PLACE_PPO",
               observation_space_mode="PPO_BASIC")
    state, _ = env.reset(jax.random.PRNGKey(4))
    a = env.get_init_action()
    state, obs, r, done, info = env.step(state, a)
    # standing at ~0.3 m: height term + smooth + pitch + pos all positive
    assert float(r) > 0.0
    assert not bool(done)


def test_obs_limits_and_noise():
    env = _env(observation_space_mode="PPO_BASIC")
    hi, lo, noise = sn.obs_limits("PPO_BASIC", env.cfg)
    assert hi.shape == lo.shape == noise.shape == (env.obs_dim,)
    state, obs1 = env.reset(jax.random.PRNGKey(5))
    state2, obs2, *_ = env.step(state, env.get_init_action())
    assert obs1.shape == obs2.shape
    # Landing flag (index -1 in PPO_BASIC) is noise-free and 0 at reset
    assert float(obs1[-1]) == 0.0


def test_randomizer_modes():
    cfg = go1_config(True)
    key = jax.random.PRNGKey(0)
    p_ground = rnd.sample_scenario(cfg, "GROUND_RANDOMIZER", key)
    assert 0.5 <= float(p_ground.friction) <= 1.0
    np.testing.assert_allclose(p_ground.spring_stiffness, cfg.spring_stiffness)
    p_test = rnd.sample_scenario(cfg, "TEST_RANDOMIZER", key)
    assert not np.allclose(p_test.spring_stiffness, cfg.spring_stiffness)
    # total mass conserved under mass randomization
    m = rnd.model_from_params(p_test)
    from quadruped_springs_tpu.models.go1_params import total_mass, build_model
    np.testing.assert_allclose(
        float(total_mass(m)), float(total_mass(build_model())), rtol=1e-5)
    # curriculum widens ranges
    p_cur = rnd.sample_scenario(cfg, "TEST_RANDOMIZER_CURRICULUM", key,
                                curriculum_level=1.0)
    assert float(p_cur.offset_mass) <= 4.0


def test_vmapped_env():
    env = _env(settling_steps=100)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    states, obs = jax.vmap(env.reset)(keys)
    assert obs.shape == (4, env.obs_dim)
    a = jnp.broadcast_to(env.get_init_action(), (4, env.action_dim))
    states2, obs2, r, done, info = jax.vmap(env.step)(states, a)
    assert r.shape == (4,)
    assert done.shape == (4,)
    # different scenarios -> different friction
    assert len(set(np.asarray(states.scenario.friction).tolist())) > 1


def test_cartesian_pd_env_steps():
    env = _env(motor_control_mode="CARTESIAN_PD",
               observation_space_mode="CARTESIAN_NO_IMU",
               settling_steps=300)
    state, obs = env.reset(jax.random.PRNGKey(0))
    state, obs, r, done, info = env.step(state, env.get_init_action())
    assert not bool(done)
    assert 0.2 < float(state.robot.pos[2]) < 0.45


def test_torque_mode_non_rl():
    env = QuadrupedEnv(EnvConfig(
        is_rl_gym_interface=False, motor_control_mode="TORQUE",
        action_space_mode="DEFAULT", task_env="NO_TASK",
        enable_springs=False, action_repeat=1, settling_steps=300,
        observation_space_mode="ENCODER"))
    state, _ = env.reset(jax.random.PRNGKey(0))
    tau = jnp.zeros(12)
    state, obs, r, done, info = env.step(state, tau)
    assert not bool(done)


def test_torque_mode_rl_rejected():
    with pytest.raises(ValueError):
        QuadrupedEnv(EnvConfig(motor_control_mode="TORQUE"))


def test_demo_reward_normalization_modes():
    """*_DEMO reward: "remaining" divides by demo_len - demo_start
    (reference task_base.py:183-211); "full" divides by demo_len so the
    same physical state earns the same reward regardless of the episode's
    RSI start (EnvConfig.demo_norm — the round-4 imitation rail)."""
    import jax.numpy as jnp

    from quadruped_springs_tpu.tasks import tasks as tk

    td = tk.get_task("JUMPING_IN_PLACE_DEMO")
    f = jnp.float32
    ctx = tk.TaskCtx(
        pos=jnp.zeros(3), lin_vel=jnp.zeros(3), rpy=jnp.zeros(3),
        quat=jnp.array([0.0, 0.0, 0.0, 1.0]), q=jnp.zeros(12),
        qd=jnp.zeros(12), motor_torques=jnp.zeros(12),
        feet_in_contact=jnp.ones(4, bool), feet_forces=jnp.zeros(4),
        invalid_contact=jnp.asarray(False), sim_time=jnp.asarray(0.0, f),
        is_flying=jnp.asarray(False), last_action=jnp.zeros(6))
    demo = jnp.zeros((100, 6))  # perfect match: exp(0) = 1
    ts = tk.init_task_state(ctx).replace(
        demo_counter=jnp.asarray(81, jnp.int32),
        demo_start=jnp.asarray(80, jnp.int32))
    r_rem = float(tk.task_reward(td, ts, ctx, demo, 100, demo_norm="remaining"))
    r_full = float(tk.task_reward(td, ts, ctx, demo, 100, demo_norm="full"))
    assert abs(r_rem - 1.0 / 20.0) < 1e-6, r_rem
    assert abs(r_full - 1.0 / 100.0) < 1e-6, r_full
    # from a clean start the two modes agree
    ts0 = tk.init_task_state(ctx).replace(
        demo_counter=jnp.asarray(1, jnp.int32))
    assert abs(float(tk.task_reward(td, ts0, ctx, demo, 100, demo_norm="remaining"))
               - float(tk.task_reward(td, ts0, ctx, demo, 100, demo_norm="full"))) < 1e-7
