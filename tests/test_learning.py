"""Learning actually learns: ARS must measurably improve the jump within a
few iterations (the round-1 suite only smoke-tested one learner step).
Full curves: examples/train_two_stage.py -> examples/out/."""

import pytest

pytestmark = pytest.mark.slow

import jax

from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.train.ars import ARSConfig, ARSTrainer


def test_ars_improves_jump():
    env = QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="JUMPING_IN_PLACE",
        observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
        settling_steps=600, max_ep_len=1.0))
    tr = ARSTrainer(env, ARSConfig(
        n_directions=8, top_directions=4, episode_steps=110,
        reset_bank_size=8, step_size=0.03, delta_std=0.04))
    ts = tr.init(jax.random.PRNGKey(0))
    ev0 = tr.evaluate(ts, n_episodes=4)
    for _ in range(5):
        ts, _ = tr.train_step(ts)
    ev1 = tr.evaluate(ts, n_episodes=4)
    # zero-policy stands (return ~0); 5 iterations must find positive
    # jumping reward and real air time
    assert float(ev1["return_mean"]) > float(ev0["return_mean"]) + 0.05, (
        float(ev0["return_mean"]), float(ev1["return_mean"]))
    assert float(ev1["max_height"]) > 0.1


def test_ppo_imitation_learns():
    """PPO imitation must close a NON-NOISE fraction of the gap between
    the random-policy floor and the perfect-imitation reward (the round-2
    gate passed on a +0.7% drift of a flat line; this one requires the
    deterministic-policy eval return to rise by >= 0.25 absolute from the
    ~0.54 random-policy floor toward the ~1.0 perfect return — measured
    curve for this exact setup: 0.54 -> 0.55 @ 60 iters (the learning is
    back-loaded), 0.85 @ 120, 0.91 @ 150)."""
    import jax.numpy as jnp

    from quadruped_springs_tpu.train import normalize as vnorm
    from quadruped_springs_tpu.train import rollout as ro
    from quadruped_springs_tpu.train.ppo import PPOConfig, PPOTrainer

    # synthetic 40-step demo: a crouch-extend action schedule (the demo
    # SHAPE matters, not its provenance — keeps the test hermetic)
    t = jnp.linspace(0.0, 1.0, 40)[:, None]
    crouch = jnp.asarray([0.0, 0.4, -0.8, 0.0, 0.4, -0.8])
    extend = jnp.asarray([0.0, -0.4, 1.0, 0.0, -0.4, 1.0])
    acts = jnp.where(t < 0.5, crouch, extend)
    env = QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="JUMPING_IN_PLACE_DEMO",
        observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
        settling_steps=600, max_ep_len=1.0), demo_actions=acts)
    tr = PPOTrainer(env, PPOConfig(n_envs=16, segment_len=48,
                                   reset_bank_size=8, gamma=0.3,
                                   gae_lambda=0.9, lr=1e-3))
    ts = tr.init(jax.random.PRNGKey(1))
    p = dict(ts.params["params"])
    p["log_std"] = jnp.full_like(p["log_std"], -1.0)
    ts = ts.replace(params={"params": p})

    states, obs0 = ro.make_reset_bank(env, jax.random.PRNGKey(99), 4)

    @jax.jit
    def det_eval(params, obs_norm):
        def policy(obs):
            o = vnorm.normalize(obs_norm, obs)
            mean, _, _ = tr.net.apply(params, o)
            return jnp.clip(mean, -1.0, 1.0)
        rets, _ = ro.episode_returns(env, policy, states, obs0, 60)
        return jnp.mean(rets)

    ev0 = float(det_eval(ts.params, ts.obs_norm))
    for _ in range(150):
        ts, m = tr.train_step(ts)
    ev1 = float(det_eval(ts.params, ts.obs_norm))
    assert ev1 > ev0 + 0.25, (ev0, ev1)
