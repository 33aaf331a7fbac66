"""Batched rollout machinery for the native trainers.

Replaces the SB3 VecEnv axis (make_vec_env, load_model.py:113) with vmapped
lax.scan rollouts:

  * `episode_returns` — episodic, done-masked rollouts for ARS / evaluation.
  * `segment_rollout` — fixed-length segments with auto-reset for PPO.

Auto-reset note: a faithful env.reset re-settles the robot for 2500 sim
steps (quadruped_gym_env.py:323-329). Inside a scanned training loop that
would execute every step (both lax.cond branches trace), so auto-reset
swaps in states drawn from a pre-settled *reset bank* instead — same
distribution, O(1) per step. The bank is rebuilt (new scenarios) every
learner iteration if desired.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from quadruped_springs_tpu.env.env import QuadrupedEnv


def make_reset_bank(env: QuadrupedEnv, key: jax.Array, n: int,
                    curriculum_level=None):
    """n pre-settled reset states + initial observations (vmapped resets).
    `curriculum_level` (scalar, traced) widens the randomization ranges —
    the trainer-driven curriculum hook (env_randomizer_base.py:83-93)."""
    keys = jax.random.split(key, n)
    if curriculum_level is None:
        states, obs = jax.vmap(env.reset)(keys)
    else:
        states, obs = jax.vmap(
            lambda k: env.reset(k, curriculum_level=curriculum_level))(keys)
    return states, obs


def make_rsi_bank(env: QuadrupedEnv, demo, key: jax.Array, n: int):
    """Reset bank with reference-state initialization: each entry spawns
    at a random demo row (1-in-5 restricted to the first 20%,
    reference_state_initialization_wrapper.py:25-43) with the robot in
    that row's exact recorded state AND the imitation index advanced to
    match (env.reset(demo_start_idx=...)). The auto-reset bank then mixes
    mid-trajectory starts the way the reference's RSI wrapper does per
    reset."""
    from quadruped_springs_tpu.utils import demo as demo_util

    demo = jnp.asarray(demo)
    demo_len = int(demo.shape[0])

    def one(k):
        k1, k2 = jax.random.split(k)
        idx = demo_util.rsi_index(k1, demo_len)
        rs = demo_util.demo_robot_state(demo, idx, env.action_dim)
        return env.reset(k2, desired_robot_state=rs, demo_start_idx=idx)

    return jax.vmap(one)(jax.random.split(key, n))


def episode_returns(env: QuadrupedEnv, policy_fn: Callable, states, obs0,
                    max_steps: int):
    """Roll full episodes from given start states; returns per-episode
    (return, length, max_height, max_fwd) plus running observation moments
    (obs_count/obs_sum/obs_sumsq over every *live* step's observation, for
    VecNormalize-style stats — SB3 ARS normalizes with ALL rollout obs,
    not just reset-pose obs). policy_fn: obs -> action.
    All leading-dim batched; jit/vmap friendly (done-masked scan)."""

    d = obs0.shape[-1]

    def step_one(carry, _):
        state, obs, done, ret, length, mh, mf, oc, osum, osq = carry
        action = policy_fn(obs)
        state2, obs2, r, d2, info = jax.vmap(env.step)(state, action)
        keep = ~done
        ret = ret + jnp.where(keep, r, 0.0)
        length = length + keep.astype(jnp.int32)
        mh = jnp.maximum(mh, jnp.where(keep, info["max_height"], 0.0))
        mf = jnp.maximum(mf, jnp.where(keep, info["max_fwd"], 0.0))
        # obs statistics over live steps (flight/stance phases included)
        live = keep[:, None].astype(obs.dtype)
        oc = oc + jnp.sum(keep)
        osum = osum + jnp.sum(obs2 * live, axis=0)
        osq = osq + jnp.sum(obs2 * obs2 * live, axis=0)
        # freeze the state after done (no reset — episodic semantics)
        state = jax.tree.map(
            lambda a, b: jnp.where(done.reshape((-1,) + (1,) * (a.ndim - 1)), a, b),
            state, state2)
        obs = jnp.where(done[:, None], obs, obs2)
        return (state, obs, done | d2, ret, length, mh, mf, oc, osum, osq), None

    B = obs0.shape[0]
    init = (
        states, obs0, jnp.zeros(B, bool), jnp.zeros(B), jnp.zeros(B, jnp.int32),
        jnp.zeros(B), jnp.zeros(B),
        jnp.zeros((), obs0.dtype), jnp.zeros(d, obs0.dtype),
        jnp.zeros(d, obs0.dtype),
    )
    carry, _ = jax.lax.scan(step_one, init, None, length=max_steps)
    _, _, done, ret, length, mh, mf, oc, osum, osq = carry
    return ret, {"length": length, "max_height": mh, "max_fwd": mf,
                 "obs_count": oc, "obs_sum": osum, "obs_sumsq": osq}


def segment_rollout(env: QuadrupedEnv, action_fn: Callable, states, obs,
                    bank, key: jax.Array, T: int):
    """T-step segment with auto-reset from the bank.

    action_fn(obs, key, eps_prev) -> (action, logp, value, eps) —
    vectorized over batch; `eps` is the exploration-noise state threaded
    through the scan (AR(1)-correlated exploration, PPOConfig.noise_rho;
    reset to zero on episode boundaries).
    Returns (states, obs, traj dict with leading time axis).
    """
    bank_states, bank_obs = bank
    n_bank = bank_obs.shape[0]

    def pick_reset(idx_key):
        idx = jax.random.randint(idx_key, (), 0, n_bank)
        return (jax.tree.map(lambda a: a[idx], bank_states), bank_obs[idx])

    def step_one(carry, key_t):
        states, obs, eps = carry
        k_act, k_reset = jax.random.split(key_t)
        action, logp, value, eps2 = action_fn(obs, k_act, eps)
        # the env executes the clipped action; the stored `action` stays
        # unclipped so logp/ratio stay exact Gaussian (see PPOTrainer.
        # _action_fn — clip-at-logp distorts the learned mean)
        states2, obs2, r, done, info = jax.vmap(env.step)(
            states, jnp.clip(action, -1.0, 1.0))
        # auto-reset where done
        B = obs.shape[0]
        reset_keys = jax.random.split(k_reset, B)
        r_states, r_obs = jax.vmap(pick_reset)(reset_keys)
        states3 = jax.tree.map(
            lambda new, rs: jnp.where(
                done.reshape((-1,) + (1,) * (new.ndim - 1)), rs, new),
            states2, r_states)
        obs3 = jnp.where(done[:, None], r_obs, obs2)
        eps3 = jnp.where(done[:, None], 0.0, eps2)
        out = {"obs": obs, "action": action, "logp": logp, "value": value,
               "reward": r, "done": done,
               # pg_mask: knots where the POLICY's action was executed.
               # Autopilot env adapters (env/continuous_autopilot.py — the
               # reference trains through its landing wrappers) report
               # info["policy_in_control"]; on autopilot knots the stored
               # logp describes an action that never ran, so PPO excludes
               # them from the surrogate/KL (rewards still flow credit to
               # the launch decisions through GAE). Plain envs: all-ones.
               "pg_mask": info.get("policy_in_control",
                                   jnp.ones_like(done))}
        return (states3, obs3, eps3), out

    keys = jax.random.split(key, T)
    eps0 = jnp.zeros((obs.shape[0], env.action_dim))
    (states, obs, _), traj = jax.lax.scan(
        step_one, (states, obs, eps0), keys)
    return states, obs, traj
