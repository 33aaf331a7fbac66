"""Behavior-cloning pretraining for the PPO-imitation stage.

The reference's imitation stage is PPO on the demo-matching reward
(task_base.py:169-219: exp(-0.35 ||a_demo - a||)/delta_demo). That reward
is action-local, so pure RL credit assignment must rediscover the ~10
launch rows among ~100 mostly-static rows — measured here: per-step reward
rises while the closed-loop jump disappears. Demonstration rows carry the
FULL robot state (get_demonstration_wrapper.py:36-57), so the obs→action
map the reward asks for can be fit directly: reconstruct each row's
observation by exact-state reset (env.reset(desired_robot_state=...), the
RSI machinery) and regress the policy mean onto the recorded action.
PPO imitation then polishes the cloned policy closed-loop — the reward
still does the judging; BC is the warm start, and the stage is disclosed
in train_two_stage.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from quadruped_springs_tpu.train import normalize as vnorm
from quadruped_springs_tpu.utils import demo as demo_util


def demo_dataset(env, demo: jnp.ndarray, key: jax.Array):
    """(obs, action) pairs with the CAUSAL pairing: the state BEFORE each
    action maps to that action. Demo rows record the state AFTER the row's
    action was applied (get_demonstration_wrapper.py:36-57 reads the robot
    post-step), so row t-1's state pairs with action t, and the clean
    reset state pairs with action 0 — pairing rows with their own actions
    clones a one-step-delayed controller (measured: mse 1e-5 yet zero
    closed-loop jump)."""
    demo = jnp.asarray(demo)
    n = demo.shape[0]
    acts = demo_util.demo_actions(demo, env.action_dim)
    k0, key = jax.random.split(key)

    def one(i, k):
        rs = demo_util.demo_robot_state(demo, i, env.action_dim)
        _, obs = env.reset(k, desired_robot_state=rs, demo_start_idx=i)
        return obs

    row_obs = jax.vmap(one)(jnp.arange(n - 1), jax.random.split(key, n - 1))
    _, reset_obs = env.reset(k0)
    obs = jnp.concatenate([reset_obs[None], row_obs], axis=0)
    return obs, acts


def fit(net, obs: jnp.ndarray, acts: jnp.ndarray, key: jax.Array,
        iters: int = 3000, lr: float = 1e-3, log_std: float = -1.5):
    """Full-batch Adam regression of the actor mean onto the demo actions.
    Returns (params, obs_norm, final_mse). The critic tower is left at
    init (the PPO stage fits it); log_std is set to the given exploration
    level for the PPO polish."""
    obs_norm = vnorm.update(vnorm.RunningNorm.create(obs.shape[1]), obs)
    obs_n = vnorm.normalize(obs_norm, obs)
    params = net.init(key, obs_n[0])
    tx = optax.adam(lr)

    def loss_fn(p):
        mean, _, _ = net.apply(p, obs_n)
        return jnp.mean((mean - acts) ** 2)

    def step(carry, _):
        p, o = carry
        l, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        return (optax.apply_updates(p, up), o), l

    (params, _), losses = jax.lax.scan(
        step, (params, tx.init(params)), None, length=iters)
    pp = dict(params["params"])
    pp["log_std"] = jnp.full_like(pp["log_std"], log_std)
    return {"params": pp}, obs_norm, losses[-1]
