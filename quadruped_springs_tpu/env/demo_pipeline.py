"""Demonstration collection pipeline — get_demonstrations.py, functional.

The reference records expert trajectories by running a trained ARS policy
under GetDemonstrationWrapper + LandingWrapper2 + GoToRestWrapper +
SaveDemoWrapper (get_demonstrations.py:39-96). Here the landing/rest
autopilot is flattened into a per-step mode machine (PHASE_POLICY →
PHASE_TAKEOFF → PHASE_LANDING → PHASE_REST) so one lax.scan both drives
the episode and records one demo row per control step — vmappable to
collect whole demo libraries in parallel.

Demo rows follow the reference layout (get_demonstration_wrapper.py:36-52):
[action, q(12), qd(12), base pos(3), quat(4), lin vel(3), ang vel(3),
 landing flag] — see utils/demo.py.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from quadruped_springs_tpu.env.env import QuadrupedEnv
from quadruped_springs_tpu.utils import demo as demo_util

PHASE_POLICY = 0
PHASE_TAKEOFF = 1
PHASE_LANDING = 2
PHASE_REST = 3

_G = 9.81


def collect_demo(env: QuadrupedEnv, policy_fn: Callable, key: jax.Array,
                 max_steps: int = 200, rest_duration: float | None = None):
    """Run one autopiloted episode, recording a demo row per control step.

    Args:
      policy_fn: obs -> action (the expert, e.g. a trained ARS policy).
    Returns:
      (rows (max_steps, row_dim), valid (max_steps,) bool, final env state)
    """
    if rest_duration is None:
        rest_duration = 1.0 if env.config.enable_springs else 0.3
    n_ramp = max(int(rest_duration / env.env_time_step), 1)
    landing_action = env.get_landing_action()
    rest_action = env.get_init_action()

    state0, obs0 = env.reset(key)

    def step_fn(carry, _):
        state, obs, phase, held, peak_deadline, rest_i, done = carry

        pol_a = policy_fn(obs)
        ramp = jnp.minimum((rest_i + 1.0) / n_ramp, 1.0)
        rest_a = held * (1 - ramp) + ramp * rest_action
        action = jnp.select(
            [phase == PHASE_POLICY, phase == PHASE_TAKEOFF,
             phase == PHASE_LANDING, phase == PHASE_REST],
            [pol_a, held, landing_action, rest_a])

        state2, obs2, r, d2, info = env.step(state, action)

        t = env.sim_time(state2)
        switched = state2.task.switched_controller
        flying = ~jnp.any(state2.feet_in_contact)
        # phase transitions (landing_wrapper.py / go_to_rest_wrapper.py)
        new_deadline = t + state2.robot.lin_vel[2] / _G
        enter_takeoff = (phase == PHASE_POLICY) & switched
        phase2 = jnp.where(enter_takeoff, PHASE_TAKEOFF, phase)
        peak_deadline = jnp.where(enter_takeoff, new_deadline, peak_deadline)
        held2 = jnp.where(enter_takeoff, action, held)
        phase2 = jnp.where((phase2 == PHASE_TAKEOFF) & (t >= peak_deadline),
                           PHASE_LANDING, phase2)
        landed = (phase2 == PHASE_LANDING) & ~flying
        phase2 = jnp.where(landed, PHASE_REST, phase2)
        held2 = jnp.where(landed, landing_action, held2)
        rest_i2 = jnp.where(phase2 == PHASE_REST, rest_i + 1, rest_i)

        # Record the FILTERED action (what the motors actually tracked) —
        # get_demonstration_wrapper.py:36-40 records
        # env.get_last_filtered_action(), not the raw policy output.
        row = demo_util.demo_row(state2.last_filtered_action, state2.robot,
                                 phase2 >= PHASE_LANDING)
        valid = ~done
        state_keep = jax.tree.map(
            lambda a, b: jnp.where(done, a, b), state, state2)
        return ((state_keep, jnp.where(done, obs, obs2), phase2, held2,
                 peak_deadline, rest_i2, done | d2),
                (row, valid))

    init = (state0, obs0, jnp.asarray(PHASE_POLICY), jnp.zeros(env.action_dim),
            jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(False))
    carry, (rows, valid) = jax.lax.scan(step_fn, init, None, length=max_steps)
    return rows, valid, carry[0]


def save_demo_library(path: str, rows, valid) -> None:
    """Persist valid rows through the native trajectory store."""
    import numpy as np
    from quadruped_springs_tpu.runtime import trajstore
    rows = np.asarray(rows)[np.asarray(valid)]
    trajstore.write(path, rows)


def load_demo_library(path: str):
    import jax.numpy as jnp
    from quadruped_springs_tpu.runtime import trajstore
    return jnp.asarray(trajstore.read(path))
