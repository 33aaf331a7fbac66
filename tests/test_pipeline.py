"""End-to-end pipeline tests: CPG locomotion, demo collection → imitation
task → RSI, monitor recording, experiment save/load."""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.control import cpg
from quadruped_springs_tpu.env import demo_pipeline as dp
from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.models.go1_params import go1_config
from quadruped_springs_tpu.utils import demo as demo_util
from quadruped_springs_tpu.utils import monitor


from tests.conftest import env_factory

_env = env_factory(
    enable_springs=True, task_env="JUMPING_IN_PLACE",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=300, max_ep_len=2.0,
)


# ---------------------------------------------------------------------------
# CPG
# ---------------------------------------------------------------------------

def test_cpg_converges_to_limit_cycle():
    params = cpg.HopfParams()
    X = cpg.init_state(params, jax.random.PRNGKey(0))

    def step(X, _):
        X2, x, z = cpg.cpg_update(params, X)
        return X2, (x, z)

    X, (xs, zs) = jax.lax.scan(step, X, None, length=3000)
    # amplitude converges to sqrt(mu)
    np.testing.assert_allclose(X[0], np.sqrt(params.mu), rtol=0.05)
    # trot: diagonal pairs in phase, lateral pairs out of phase
    th = np.asarray(X[1])
    def phase_diff(a, b):
        d = abs(a - b) % (2 * np.pi)
        return min(d, 2 * np.pi - d)
    assert phase_diff(th[0], th[3]) < 0.3      # FR-RL diagonal
    assert phase_diff(th[1], th[2]) < 0.3      # FL-RR diagonal
    assert abs(phase_diff(th[0], th[1]) - np.pi) < 0.3
    # foot refs bounded by clearance/penetration
    assert float(zs.max()) <= -params.robot_height + params.ground_clearance + 1e-6
    assert float(zs.min()) >= -params.robot_height - params.ground_penetration - 1e-6


def test_cpg_torque_law_shapes():
    cfg = go1_config(False)
    tau = cpg.cpg_torques(cfg, cfg.init_joint_angles, jnp.zeros(12),
                          jnp.zeros(4), jnp.full(4, -0.25))
    assert tau.shape == (12,)
    assert bool(jnp.all(jnp.isfinite(tau)))


def test_cpg_locomotion_in_env():
    """CPG torque control through the non-RL TORQUE env: robot must stay
    upright and make forward progress (the hopf_network.py __main__ run)."""
    env = QuadrupedEnv(EnvConfig(
        is_rl_gym_interface=False, motor_control_mode="TORQUE",
        action_space_mode="DEFAULT", task_env="NO_TASK", enable_springs=False,
        action_repeat=1, settling_steps=500, observation_space_mode="ENCODER",
        obs_noise=False))
    params = cpg.HopfParams(omega_swing=5 * 2 * jnp.pi,
                            omega_stance=2 * 2 * jnp.pi)
    cfg = env.cfg

    state, _ = env.reset(jax.random.PRNGKey(0))
    X = cpg.init_state(params, jax.random.PRNGKey(1))

    def step(carry, _):
        state, X = carry
        X2, fx, fz = cpg.cpg_update(params, X)
        tau = cpg.cpg_torques(cfg, state.robot.q, state.robot.qd, fx, fz)
        state2, _, _, done, _ = env.step(state, tau)
        return (state2, X2), (state2.robot.pos, done)

    (state, _), (pos, done) = jax.lax.scan(step, (state, X), None, length=1500)
    assert not bool(done.any()), "robot fell during CPG locomotion"
    assert float(pos[-1, 2]) > 0.15, "robot collapsed"
    assert float(pos[-1, 0]) > 0.02, f"no forward progress: {pos[-1]}"


# ---------------------------------------------------------------------------
# Demo pipeline + imitation + RSI
# ---------------------------------------------------------------------------

def _jump_policy(env):
    crouch = jnp.array([0.0, 0.4, -0.8, 0.0, 0.4, -0.8])
    extend = jnp.array([0.0, -0.4, 1.0, 0.0, -0.4, 1.0])

    def policy(obs):
        # height-velocity sensor tells us the phase; simple scripted expert
        return jnp.where(obs[..., -1] < -100, crouch, crouch)  # placeholder

    # time-based expert instead: closure over a counter is impossible in
    # scan, so use height: crouched yet?
    def policy2(obs):
        thigh = obs[..., 1]  # FR thigh angle (first sensor = JointPosition)
        crouched = thigh > 1.0
        return jnp.where(crouched, extend, crouch)

    return policy2


def test_collect_demo_and_imitate(tmp_path):
    env = _env()
    rows, valid, _ = jax.jit(
        lambda k: dp.collect_demo(env, _jump_policy(env), k, max_steps=60)
    )(jax.random.PRNGKey(0))
    assert rows.shape == (60, env.action_dim + 12 + 12 + 3 + 4 + 3 + 3 + 1)
    n_valid = int(valid.sum())
    assert n_valid > 5

    path = str(tmp_path / "demo.qsts")
    dp.save_demo_library(path, rows, valid)
    demo = dp.load_demo_library(path)
    assert demo.shape[0] == n_valid

    # imitation env: reward = exp(-0.35||a_demo - a||)/Δ
    acts = demo_util.demo_actions(demo, env.action_dim)
    demo_env = QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="JUMPING_IN_PLACE_DEMO",
        observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
        settling_steps=300), demo_actions=acts)
    state, obs = demo_env.reset(jax.random.PRNGKey(1))
    # replaying the demo action exactly gives max per-step reward 1/Δ
    a0 = acts[0]
    state, obs, r, done, _ = demo_env.step(state, a0)
    assert float(r) <= 1.0 / demo_env.demo_len + 1e-5
    assert float(r) > 0.0
    # terminates when the demo is exhausted
    for _ in range(demo_env.demo_len + 2):
        state, obs, r, done, _ = demo_env.step(state, acts[0])
        if bool(done):
            break
    assert bool(done)


def test_rsi_reset_from_demo_state(tmp_path):
    env = _env()
    rows, valid, _ = jax.jit(
        lambda k: dp.collect_demo(env, _jump_policy(env), k, max_steps=40)
    )(jax.random.PRNGKey(0))
    demo = rows[:int(valid.sum())]
    idx = demo_util.rsi_index(jax.random.PRNGKey(3), demo.shape[0])
    rstate = demo_util.demo_robot_state(demo, idx, env.action_dim)
    state, obs = env.reset(jax.random.PRNGKey(4), desired_robot_state=rstate)
    np.testing.assert_allclose(state.robot.pos, rstate.pos, atol=1e-6)
    np.testing.assert_allclose(state.robot.q, rstate.q, atol=1e-6)
    # sim continues from the injected state
    state2, *_ = env.step(state, env.get_init_action())
    assert int(state2.sim_step_counter) == 10


# ---------------------------------------------------------------------------
# Monitor + experiment save/load
# ---------------------------------------------------------------------------

def test_monitor_records_and_exports(tmp_path):
    env = _env(max_ep_len=0.5)
    policy = lambda obs: env.get_init_action()
    recs = jax.jit(lambda k: monitor.record_rollout(env, policy, k, 30))(
        jax.random.PRNGKey(0))
    assert recs["base_pos"].shape == (30, 3)
    k = monitor.kpis(recs)
    assert k["steps"] > 0 and np.isfinite(k["return"])
    u = monitor.spring_energy_trace(env, recs)
    assert u.shape == (30,) and bool(jnp.all(u >= 0))
    path = str(tmp_path / "traj.qsts")
    monitor.export_trajectory(path, recs)
    from quadruped_springs_tpu.runtime import trajstore
    assert trajstore.read(path).shape[0] == k["steps"]
    # all ten MonitorState plot families (monitor_state.py:66-341)
    plots = monitor.plot_rollout(recs, str(tmp_path / "plot"), env=env)
    assert len(plots) == 10
    import os
    names = {os.path.basename(p) for p in plots}
    for fam in ("height", "angles", "motor_torque", "motor_true_velocity",
                "feet_normal_forces", "elastic_potential_energy",
                "forward_jumping", "pitch", "pitch_rate", "actions"):
        assert f"plot_{fam}.png" in names, fam
    for p in plots:
        assert os.path.getsize(p) > 1000
    # VideoRec consumer: stick-figure animation from the recording
    from quadruped_springs_tpu.utils import render
    vid = render.render_rollout(recs, str(tmp_path / "vid.gif"),
                                camera_mode="CLASSIC", stride=5)
    assert os.path.exists(vid) and os.path.getsize(vid) > 1000


def test_experiment_save_load_roundtrip(tmp_path):
    from quadruped_springs_tpu.train.ars import ARSConfig, ARSTrainer
    from quadruped_springs_tpu.train import evaluate as ev
    env_cfg = EnvConfig(
        enable_springs=True, task_env="JUMPING_IN_PLACE",
        observation_space_mode="ARS_BASIC", settling_steps=50, max_ep_len=0.3)
    env = QuadrupedEnv(env_cfg)
    tr = ARSTrainer(env, ARSConfig(n_directions=2, top_directions=2,
                                   episode_steps=5, reset_bank_size=2))
    ts = tr.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "exp")
    ev.save_experiment(path, env_cfg, "ars", ts)
    env2, policy = ev.load_experiment(path)
    assert env2.obs_dim == env.obs_dim
    metrics = ev.evaluate_policy(env2, policy, jax.random.PRNGKey(1),
                                 n_episodes=2, max_steps=5)
    assert np.isfinite(metrics["return_mean"])
