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
