"""Round-2 wrapper-parity tests: GoToRest rest_condition trigger,
LandingWrapperBackflip2 one-shot / exit-on-ground semantics, filtered
actions in demo rows, trainer-driven curriculum, camera eye placement,
MPPI smooth-noise normalization."""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.env import wrappers as wr


from tests.conftest import env_factory

_env = env_factory(
    enable_springs=True,
    motor_control_mode="PD",
    action_space_mode="SYMMETRIC",
    task_env="JUMPING_IN_PLACE",
    observation_space_mode="ARS_BASIC",
    settling_steps=600,
    max_ep_len=1.0,
)


# -- GoToRestWrapper (go_to_rest_wrapper.py:43-95) -------------------------

def test_rest_condition_requires_jump_contact_and_rising_height():
    env = _env()
    w = wr.GoToRestWrapper(env)
    state, _ = env.reset(jax.random.PRNGKey(0))
    out = wr._pack(env, env.step(state, env.get_init_action()))
    # standing still: no jump yet -> condition must be False regardless of h
    assert not bool(w.rest_condition(jnp.asarray(0.0), out))
    # fake the post-jump latch: switched + grounded + height rose
    forced = out.replace(state=out.state.replace(
        task=out.state.task.replace(switched_controller=jnp.asarray(True))))
    h_prev_low = forced.state.robot.pos[2] - 0.01
    h_prev_high = forced.state.robot.pos[2] + 0.01
    assert bool(w.rest_condition(h_prev_low, forced))       # rising -> True
    assert not bool(w.rest_condition(h_prev_high, forced))  # falling -> False


def test_go_to_rest_step_triggers_and_reaches_rest_pose():
    env = _env()
    w = wr.GoToRestWrapper(env)
    state, _ = env.reset(jax.random.PRNGKey(1))
    wstate = w.init_state(state)
    # force the jumped latch so a grounded, rebounding robot triggers rest
    state = state.replace(task=state.task.replace(
        switched_controller=jnp.asarray(True)))
    # crouch (height falls), then extend (height rises while grounded)
    crouch = jnp.array([0.0, 0.4, -0.8, 0.0, 0.4, -0.8])
    for _ in range(10):
        out, wstate = w.step(state, wstate, crouch)
        state = out.state
    extend = jnp.array([0.0, -0.1, 0.2, 0.0, -0.1, 0.2])
    triggered = False
    for _ in range(10):
        out, wstate = w.step(state, wstate, extend)
        state = out.state
        if bool(out.done):
            triggered = True
            break
    # once triggered, rest_phase runs to episode end (timeout at 1 s)
    assert triggered
    # the ramp drove joints toward the init pose
    err = np.abs(np.asarray(state.robot.q - env.cfg.init_joint_angles))
    assert err.max() < 0.4, err


# -- LandingWrapperBackflip2 (landing_wrapper_backflip2.py:50,72-83) -------

def test_backflip2_one_shot_and_exits_when_grounded():
    env = _env(task_env="BACKFLIP", observation_space_mode="ARS_BACKFLIP",
               max_ep_len=2.0)
    w = wr.LandingWrapperBackflip(env, variant="until_grounded")
    state, _ = env.reset(jax.random.PRNGKey(2))
    wstate = w.init_state()
    assert bool(wstate.armed)
    crouch = jnp.array([0.0, 0.4, -0.8, 0.0, 0.4, -0.8])
    extend = jnp.array([0.0, -0.2, 0.6, 0.0, -0.6, 1.0])
    for i in range(40):
        a = crouch if i < 12 else extend
        out, wstate = w.step(state, a, wstate)
        state = out.state
        if bool(out.state.task.switched_controller):
            break
    # after the take-off trigger fired once the autopilot must be disarmed
    if bool(out.state.task.switched_controller):
        assert not bool(wstate.armed)
        # v2 exits the landing loop when grounded (or the episode ended) —
        # unlike v1 it does NOT necessarily consume the episode
        grounded = bool(jnp.any(out.state.feet_in_contact))
        assert grounded or bool(out.done)


def test_backflip_v1_requires_symmetric():
    env = _env(task_env="BACKFLIP", observation_space_mode="ARS_BACKFLIP",
               action_space_mode="DEFAULT")
    try:
        wr.LandingWrapperBackflip(env)
        assert False, "expected ValueError"
    except ValueError:
        pass


# -- filtered actions recorded in demo rows --------------------------------

def test_env_tracks_applied_action_as_last_filtered():
    env = _env(enable_action_filter=True)
    state, _ = env.reset(jax.random.PRNGKey(3))
    a = jnp.full((env.action_dim,), 0.7)
    state, *_ = env.step(state, a)
    filt = np.asarray(state.last_filtered_action)
    # the 3 Hz Butterworth cannot pass a step unchanged
    assert not np.allclose(filt, np.asarray(a)), filt
    np.testing.assert_allclose(np.asarray(state.last_action), np.asarray(a))
    # without the filter the applied action IS the raw action
    env2 = _env()
    s2, _ = env2.reset(jax.random.PRNGKey(3))
    s2, *_ = env2.step(s2, a)
    np.testing.assert_allclose(np.asarray(s2.last_filtered_action),
                               np.asarray(a))


# -- external-force injection hook (quadruped.py:338-343) ------------------

def test_env_external_force_hook():
    env = _env()
    state, _ = env.reset(jax.random.PRNGKey(5))
    a = env.get_init_action()
    s_push, *_ = env.step(state, a,
                          ext_force_world=jnp.array([150.0, 0.0, 0.0]))
    s_free, *_ = env.step(state, a)
    dv = float(s_push.robot.lin_vel[0] - s_free.robot.lin_vel[0])
    assert dv > 0.02, dv  # 150 N x 10 ms on ~12 kg -> ~0.12 m/s


# -- trainer-driven curriculum (env_randomizer_base.py:83-93) --------------

def test_curriculum_level_widens_randomization():
    from quadruped_springs_tpu.env import randomizers as rnd
    from quadruped_springs_tpu.models.go1_params import go1_config
    cfg = go1_config(True)
    keys = jax.random.split(jax.random.PRNGKey(0), 64)
    lo = jax.vmap(lambda k: rnd.sample_scenario(
        cfg, "TEST_RANDOMIZER_CURRICULUM", k, 0.0))(keys)
    hi = jax.vmap(lambda k: rnd.sample_scenario(
        cfg, "TEST_RANDOMIZER_CURRICULUM", k, 1.0))(keys)
    # level 0: offset mass <= 1 kg; level 1: range widens to 4 kg
    assert float(jnp.max(lo.offset_mass)) <= 1.0 + 1e-6
    assert float(jnp.max(hi.offset_mass)) > 1.5
    # spring error widens from 10% to 30%
    k_dev_lo = jnp.max(jnp.abs(lo.spring_stiffness / cfg.spring_stiffness - 1))
    k_dev_hi = jnp.max(jnp.abs(hi.spring_stiffness / cfg.spring_stiffness - 1))
    assert float(k_dev_lo) <= 0.1 + 1e-6
    assert float(k_dev_hi) > 0.15


def test_ars_curriculum_progression():
    from quadruped_springs_tpu.train.ars import ARSConfig, ARSTrainer
    env = _env(env_randomizer_mode="TEST_RANDOMIZER_CURRICULUM",
               settling_steps=50, max_ep_len=0.1)
    tr = ARSTrainer(env, ARSConfig(
        n_directions=2, top_directions=1, episode_steps=3,
        reset_bank_size=2, curriculum_increase=0.4))
    ts = tr.init(jax.random.PRNGKey(0))
    assert float(ts.curriculum_level) == 0.0
    ts, m = tr.train_step(ts)
    ts, m = tr.train_step(ts)
    ts, m = tr.train_step(ts)
    assert abs(float(ts.curriculum_level) - 1.0) < 1e-6  # clipped at 1
    # manual hook mirrors quadruped_gym_env.py:423-425
    ts2 = tr.increase_curriculum_level(tr.init(jax.random.PRNGKey(1)), 0.25)
    assert abs(float(ts2.curriculum_level) - 0.25) < 1e-6
    # obs statistics now come from rollout observations, not the reset bank:
    # count grows by ~episodes*steps*2 directions, far above bank size
    assert float(ts.obs_norm.count) > 20.0


# -- camera eye placement (ADVICE.md round 1, medium) ----------------------

def test_camera_eye_above_target_for_negative_pitch():
    from quadruped_springs_tpu.utils import camera as cam
    base = np.tile(np.array([0.0, 0.0, 0.3]), (5, 1))
    for mode in cam.CAMERA_MODES:
        track = cam.make_camera(mode, base)
        assert np.all(track.pitch < 0)  # all defaults look down
        eye = track.eye()
        assert np.all(eye[:, 2] > track.target[:, 2]), mode


# -- MPPI smooth-noise marginal std (ADVICE.md round 1) --------------------

def test_mppi_smooth_noise_preserves_marginal_std():
    """The low-pass + renormalization must keep per-step exploration std at
    sigma for every horizon step (the old 2.2 factor under-restored it)."""
    a, b = 0.7, 0.3
    H, K = 40, 4096
    key = jax.random.PRNGKey(0)
    eps = jax.random.normal(key, (K, H, 1))

    def lp(c, e):
        c2 = a * c + b * e
        return c2, c2

    _, f = jax.lax.scan(lp, jnp.zeros((K, 1)), jnp.swapaxes(eps, 0, 1))
    t = jnp.arange(H, dtype=jnp.float32)
    norm = b * jnp.sqrt((1.0 - a ** (2.0 * (t + 1.0))) / (1.0 - a * a))
    out = jnp.swapaxes(f, 0, 1) / norm[None, :, None]
    stds = np.asarray(jnp.std(out, axis=0)).ravel()
    np.testing.assert_allclose(stds, 1.0, atol=0.05)


# -- RestTruncationWrapper (round 4: wired into the fine-tune stage) -------

def test_rest_truncation_wrapper_truncates_after_landing():
    """The agent-visible MDP of the reference training stack ends at
    landing (GoToRestWrapper discards post-trigger rewards,
    go_to_rest_wrapper.py:74-78): the wrapper must end the episode at the
    rest condition — after a jump, feet down, height rising — while the
    raw env keeps paying the standing reward stream."""
    from tests.conftest import env_factory
    dense = env_factory(
        enable_springs=True, task_env="JUMPING_IN_PLACE_PPO",
        observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
        settling_steps=600, max_ep_len=2.0)()
    w = wr.RestTruncationWrapper(dense)
    crouch = jnp.array([0.0, 0.2, -0.4, 0.0, 0.2, -0.4])
    init_a = dense.get_init_action()

    def drive(env, latch):
        """Small crouch, then release to the init pose (height rises
        through the grounded recovery — the rest signature). `latch`
        fakes the post-jump controller switch the condition requires."""
        state, _ = dense.reset(jax.random.PRNGKey(3))
        if latch:
            state = state.replace(task=state.task.replace(
                switched_controller=jnp.asarray(True)))
        for i in range(30):
            a = crouch if i < 10 else init_a
            state, _, _, done, _ = env.step(state, a)
            if bool(done):
                return i, state
        return 30, state

    # no jump happened (switched_controller False): never truncates
    t0, _ = drive(w, latch=False)
    assert t0 == 30, t0
    # post-jump latch set: the wrapper truncates during the grounded
    # height-rising recovery; the raw env keeps going
    t_w, s_w = drive(w, latch=True)
    t_raw, _ = drive(dense, latch=True)
    assert t_w < 30 <= t_raw, (t_w, t_raw)
    assert bool(jnp.all(s_w.feet_in_contact))
    assert float(s_w.robot.pos[2]) > 0.15
    # delegation: the wrapper is a drop-in env for the trainers
    assert w.action_dim == dense.action_dim
    assert w.obs_dim == dense.obs_dim


# -- BC-anchored PPO loss (PPOConfig.bc_coef, round-4 imitation rail) ------

def test_ppo_bc_anchor_term_in_loss():
    """With bc_coef set, the loss must include bc_coef * mse(mu(demo_obs),
    demo_actions) exactly, and report it in the aux metrics."""
    import dataclasses as dc

    from quadruped_springs_tpu.train.ppo import PPOConfig, PPOTrainer

    env = _env()
    cfg = PPOConfig(n_envs=4, segment_len=8, reset_bank_size=4, bc_coef=7.0)
    tr = PPOTrainer(env, cfg)
    tr0 = PPOTrainer(env, dc.replace(cfg, bc_coef=0.0))
    key = jax.random.PRNGKey(0)
    params = tr.net.init(key, jnp.zeros(env.obs_dim))
    n = 16
    batch = {
        "obs_n": jax.random.normal(key, (n, env.obs_dim)),
        "action": jax.random.normal(jax.random.PRNGKey(1), (n, env.action_dim)),
        "logp": jnp.zeros(n),
        "adv": jax.random.normal(jax.random.PRNGKey(2), (n,)),
        "ret": jnp.zeros(n),
        "pg_mask": jnp.ones(n, bool),
    }
    bo = jax.random.normal(jax.random.PRNGKey(3), (32, env.obs_dim))
    ba = jax.random.normal(jax.random.PRNGKey(4), (32, env.action_dim))
    tr.set_bc_anchor(bo, ba)
    loss_a, aux_a = tr._loss(params, batch)
    loss_0, aux_0 = tr0._loss(params, batch)
    mean, _, _ = tr.net.apply(params, bo)
    expect = float(jnp.mean((mean - ba) ** 2))
    np.testing.assert_allclose(float(aux_a["bc_mse"]), expect, rtol=1e-5)
    np.testing.assert_allclose(float(loss_a - loss_0), 7.0 * expect,
                               rtol=1e-4)


import pytest


@pytest.mark.slow
def test_flat_rollout_matches_wrapper_episode():
    """env/flat_rollout.py re-expresses LandingWrapperBackflip
    (variant="until_grounded") as a branch-free scan; driven by the same
    launch policy and lander it must visit the same sim-knot sequence:
    same PRNG stream, same sim_step_counter at done, same final pose."""
    import os
    from quadruped_springs_tpu.env import flat_rollout as fr
    from quadruped_springs_tpu.train import normalize as vnorm
    from quadruped_springs_tpu.train.networks import linear_policy_apply

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    d = np.load(os.path.join(here, "examples/policies/backflip_ars.npz"))
    W = jnp.asarray(d["W"])
    on = vnorm.RunningNorm(mean=jnp.asarray(d["mean"]),
                           var=jnp.asarray(d["var"]),
                           count=jnp.asarray(d["count"]))
    env = _env(task_env="BACKFLIP", observation_space_mode="ARS_BACKFLIP",
               max_ep_len=4.0, obs_noise=True)
    landing = jnp.asarray(env.get_landing_action())

    def launch_fn(o):
        return linear_policy_apply(W, vnorm.normalize(on, o))

    def lander_fn(o):
        return landing

    key = jax.random.PRNGKey(5)
    # wrapper-driven deployment loop (the run_robust/full_episode shape)
    w = wr.LandingWrapperBackflip(env, variant="until_grounded")
    state, obs = env.reset(key)
    wstate = w.init_state()
    for _ in range(120):
        a = launch_fn(obs) if bool(wstate.armed) else lander_fn(obs)
        out, wstate = w.step(state, a, wstate)
        state, obs = out.state, out.obs
        if bool(out.done):
            break
    # flattened episode from the same reset
    state0, obs0 = env.reset(key)
    state_f, ph_f, traj = fr.backflip_episode(env, launch_fn, lander_fn,
                                              state0, obs0, 120)
    assert bool(ph_f.done) == bool(out.done)
    assert int(state_f.sim_step_counter) == int(state.sim_step_counter), (
        "knot-sequence divergence: flattened episode consumed a different "
        "number of sim steps than the wrapper-driven one")
    # the two compilations reassociate float ops differently and stiff
    # contact amplifies that (measured: 0.7 mm x-drift over a full flip
    # episode); the semantic asserts above (same done, same knot count,
    # same phases) carry the parity claim — the pose check only guards
    # against gross divergence (wrong action source somewhere)
    np.testing.assert_allclose(np.asarray(state_f.robot.pos),
                               np.asarray(state.robot.pos), atol=5e-3)
    np.testing.assert_allclose(np.asarray(state_f.robot.quat),
                               np.asarray(state.robot.quat), atol=5e-3)
    np.testing.assert_allclose(np.asarray(state_f.robot.q),
                               np.asarray(state.robot.q), atol=5e-3)
    # the phase trace must contain every mode the wrapper visited
    phases = np.asarray(traj["phase"])
    assert set(np.unique(phases)) >= {0, 1, 2}, phases


@pytest.mark.slow
def test_continuous_autopilot_env_matches_wrapper():
    """env/continuous_autopilot.py re-expresses LandingWrapperContinuous
    (hold_landing=True) as per-step action selection; driven by the same
    scripted hopper it must execute the same env-step sequence: same sim
    step count over the window, same final pose, and the autopilot must
    actually engage (>= 1 jump with both TAKEOFF and LANDING knots)."""
    from quadruped_springs_tpu.env import continuous_autopilot as ca

    env = _env(task_env="CONTINUOUS_JUMPING_FORWARD3",
               observation_space_mode="PPO_CONTINUOUS_JUMPING_FORWARD",
               max_ep_len=4.0)

    crouch = jnp.array([0.0, 0.4, -0.8, 0.0, 0.4, -0.8])
    extend = jnp.array([0.0, -0.4, 1.0, 0.0, -0.4, 1.0])

    def policy(obs):
        # obs starts with JointPosition(12): FR thigh angle at index 1 —
        # a relaxation oscillator (crouch until deep, then extend) that
        # produces repeated hops (measured: 2 jumps before a fall)
        return jnp.where(obs[1] > 0.95, extend, crouch)

    key = jax.random.PRNGKey(3)
    # wrapper-driven deployment loop
    w = wr.LandingWrapperContinuous(env)
    state, obs = env.reset(key)
    wstate = w.init_state()
    n_policy_steps = 90
    for _ in range(n_policy_steps):
        out, wstate = w.step(state, wstate, policy(obs))
        state, obs = out.state, out.obs
        if bool(out.done):
            break
    n_knots = int(state.sim_step_counter) // env.config.action_repeat

    # adapter-driven per-knot loop from the same reset
    aenv = ca.ContinuousAutopilotEnv(env)
    astate, aobs = aenv.reset(key)
    phases = []
    for _ in range(n_knots):
        astate, aobs, r, done, info = aenv.step(astate, policy(aobs))
        phases.append(int(astate.phase))
        if bool(done):
            break
    assert int(astate.env.sim_step_counter) == int(state.sim_step_counter)
    np.testing.assert_allclose(np.asarray(astate.env.robot.pos),
                               np.asarray(state.robot.pos), atol=5e-3)
    np.testing.assert_allclose(np.asarray(astate.env.robot.q),
                               np.asarray(state.robot.q), atol=5e-3)
    assert int(astate.env.task.jump_counter) == int(state.task.jump_counter)
    # the autopilot engaged: both TAKEOFF and LANDING knots occurred
    assert ca.TAKEOFF in phases and ca.LANDING in phases, set(phases)
    assert int(state.task.jump_counter) >= 1
