"""Continuous-jumping per-jump autopilot as a branch-free env adapter.

The reference trains its continuous-jumping PPO policy THROUGH the
per-jump landing wrappers (landing_wrapper_continuous.py / *2.py composed
into the training env): on each detected jump the wrapper repeats the
take-off action until the ballistic peak, then holds the landing action
until touchdown, then hands control back — re-arming every jump. One
policy step therefore spans a variable number of env steps, which is how
`LandingWrapperContinuous` here reproduces it for deployment
(data-dependent `lax.while_loop`s — correct, but impossible to vmap across
training lanes).

This module re-expresses the SAME per-jump phase machine as per-control-
step action selection (the env/flat_rollout.py treatment of the backflip
wrapper, SURVEY §7 hard-part #5): the adapter looks like a plain
functional env — `reset(key) -> (state, obs)`, `step(state, action) ->
(state, obs, reward, done, info)` — whose state carries the autopilot
phase, so every existing trainer (ARS / PPO / rollout banks) runs through
the autopilot unchanged and lane-parallel. The policy is queried every
control step but its output is EXECUTED only in the POLICY phase; the env
action sequence matches the wrapper's exactly (same env.step call
sequence -> same PRNG stream), gated in tests/test_wrapper_parity.py.
`info["policy_in_control"]` marks the knots where the executed action was
the policy's — PPO masks its policy-gradient terms to those knots
(PPOConfig + segment_rollout), since autopilot-knot log-probabilities
describe actions that were never executed; returns/advantages still flow
credit back to the launch decisions through GAE.

Phases (landing_wrapper_continuous.py:29-54 semantics, hold_landing=True):
  POLICY   policy action executed; on post-step jump detection
           (task.is_jumping) enter TAKEOFF holding that action with
           deadline = sim_time + vz/g
  TAKEOFF  held action executed until sim_time >= deadline, then LANDING
  LANDING  landing action executed while flying; at touchdown control
           returns to POLICY (re-armed)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from quadruped_springs_tpu.env.env import EnvState, QuadrupedEnv

_G = 9.81

POLICY = 0
TAKEOFF = 1
LANDING = 2


@struct.dataclass
class APState:
    """Autopilot-augmented env state (leading pytree node = EnvState)."""
    env: EnvState
    phase: jnp.ndarray      # () int32
    held: jnp.ndarray       # (action_dim,) action held through take-off
    deadline: jnp.ndarray   # () sim-time of the ballistic peak


class ContinuousAutopilotEnv:
    """QuadrupedEnv + per-jump landing autopilot, trainer-compatible."""

    def __init__(self, env: QuadrupedEnv, hold_landing: bool = True):
        self.env = env
        self.hold_landing = hold_landing
        self.landing_action = jnp.asarray(env.get_landing_action())

    # ---- trainer-facing surface (mirrors QuadrupedEnv) -----------------
    @property
    def action_dim(self):
        return self.env.action_dim

    @property
    def obs_dim(self):
        return self.env.obs_dim

    @property
    def config(self):
        return self.env.config

    @property
    def env_time_step(self):
        return self.env.env_time_step

    def sim_time(self, state: APState):
        return self.env.sim_time(state.env)

    def get_init_action(self):
        return self.env.get_init_action()

    def get_landing_action(self):
        return self.env.get_landing_action()

    def reset(self, key, **kw):
        state, obs = self.env.reset(key, **kw)
        return APState(
            env=state,
            phase=jnp.asarray(POLICY, jnp.int32),
            held=jnp.zeros(self.env.action_dim),
            deadline=jnp.asarray(0.0, jnp.float32),
        ), obs

    def step(self, state: APState, action: jnp.ndarray):
        env = self.env
        # pre-step phase resolution (the wrapper checks its loop conditions
        # BEFORE each inner env.step): peak reached -> LANDING; touchdown
        # -> control back to POLICY (re-armed, landing_wrapper_continuous
        # re-arms every jump)
        t = env.sim_time(state.env)
        flying = ~jnp.any(state.env.feet_in_contact)
        phase = jnp.where(
            (state.phase == TAKEOFF) & (t >= state.deadline),
            LANDING if self.hold_landing else POLICY, state.phase)
        phase = jnp.where((phase == LANDING) & ~flying, POLICY, phase)

        in_policy = phase == POLICY
        exec_action = jnp.where(
            in_policy, action,
            jnp.where(phase == TAKEOFF, state.held, self.landing_action))
        env2, obs, r, done, info = env.step(state.env, exec_action)

        # post-step jump trigger (the wrapper fires on task.is_jumping
        # after a policy step): hold the action just executed, peak
        # deadline from the post-step vertical velocity
        trigger = in_policy & env2.task.is_jumping & ~done
        phase2 = jnp.where(trigger, TAKEOFF, phase)
        held2 = jnp.where(trigger, exec_action, state.held)
        deadline2 = jnp.where(
            trigger, env.sim_time(env2) + env2.robot.lin_vel[2] / _G,
            state.deadline)

        info = dict(info)
        info["policy_in_control"] = in_policy
        return (APState(env=env2, phase=phase2, held=held2,
                        deadline=deadline2), obs, r, done, info)
