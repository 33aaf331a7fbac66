"""Trainer smoke + correctness tests: ARS and PPO learner steps run,
improve-able objective plumbing (finite losses, KL sane), normalization,
checkpoint roundtrip. Tiny sizes — these validate wiring, not final
policies."""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.train import normalize as vnorm
from quadruped_springs_tpu.train import rollout as ro
from quadruped_springs_tpu.train.ars import ARSConfig, ARSTrainer
from quadruped_springs_tpu.train.ppo import PPOConfig, PPOTrainer


def _env(**kw):
    defaults = dict(
        enable_springs=True, task_env="JUMPING_IN_PLACE_PPO",
        observation_space_mode="PPO_BASIC", action_space_mode="SYMMETRIC",
        settling_steps=50, max_ep_len=0.5,
    )
    defaults.update(kw)
    return QuadrupedEnv(EnvConfig(**defaults))


def test_running_norm_matches_numpy():
    rng = np.random.RandomState(0)
    rn = vnorm.RunningNorm.create(4)
    all_batches = []
    for i in range(5):
        b = rng.randn(16, 4) * (i + 1) + i
        all_batches.append(b)
        rn = vnorm.update(rn, jnp.asarray(b))
    allb = np.concatenate(all_batches)
    np.testing.assert_allclose(rn.mean, allb.mean(axis=0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(rn.var, allb.var(axis=0), rtol=1e-3, atol=1e-3)


def test_reset_bank_and_episode_returns():
    env = _env()
    bank_states, bank_obs = ro.make_reset_bank(env, jax.random.PRNGKey(0), 4)
    assert bank_obs.shape == (4, env.obs_dim)
    policy = lambda obs: jnp.zeros((obs.shape[0], env.action_dim))
    rets, info = jax.jit(
        lambda s, o: ro.episode_returns(env, policy, s, o, 20))(
        bank_states, bank_obs)
    assert rets.shape == (4,)
    assert bool(jnp.all(jnp.isfinite(rets)))
    assert bool(jnp.all(info["length"] > 0))


def test_ars_step_runs_and_updates():
    env = _env(task_env="JUMPING_IN_PLACE", observation_space_mode="ARS_BASIC")
    tr = ARSTrainer(env, ARSConfig(
        n_directions=2, top_directions=2, episode_steps=10, reset_bank_size=2))
    ts = tr.init(jax.random.PRNGKey(0))
    ts2, metrics = tr.train_step(ts)
    assert int(ts2.iteration) == 1
    assert bool(jnp.all(jnp.isfinite(ts2.W)))
    assert np.isfinite(float(metrics["mean_return"]))
    # evaluation runs
    ev = tr.evaluate(ts2, n_episodes=2)
    assert np.isfinite(float(ev["return_mean"]))


def test_ppo_step_runs_and_updates():
    env = _env()
    tr = PPOTrainer(env, PPOConfig(
        n_envs=4, segment_len=8, n_epochs=2, n_minibatches=2,
        reset_bank_size=4))
    ts = tr.init(jax.random.PRNGKey(0))
    p0 = jax.tree.map(lambda a: a.copy(), ts.params)
    ts2, metrics = tr.train_step(ts)
    assert int(ts2.iteration) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert abs(float(metrics["approx_kl"])) < 1.0
    # params actually changed
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), p0, ts2.params)
    assert max(jax.tree.leaves(moved)) > 0
    ev = tr.evaluate(ts2, n_episodes=2, max_steps=10)
    assert np.isfinite(float(ev["return_mean"]))


def test_checkpoint_roundtrip(tmp_path):
    from quadruped_springs_tpu.utils import checkpoint as ckpt
    tree = {"a": jnp.arange(5.0), "b": {"c": jnp.ones((2, 3))}}
    path = str(tmp_path / "state")
    ckpt.save(path, tree)
    template = jax.tree.map(jnp.zeros_like, tree)
    back = ckpt.restore(path, template)
    np.testing.assert_allclose(back["a"], tree["a"])
    np.testing.assert_allclose(back["b"]["c"], tree["b"]["c"])
