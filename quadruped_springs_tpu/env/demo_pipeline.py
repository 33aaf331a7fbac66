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
                 max_steps: int = 200, rest_duration: float | None = None,
                 autopilot: bool = True):
    """Run one episode, recording a demo row per control step.

    Args:
      policy_fn: obs -> action (the expert, e.g. a trained ARS policy).
      autopilot: True = hand control to the landing/rest mode machine at
        take-off (the reference's GetDemonstration + LandingWrapper2 +
        GoToRest stack, get_demonstrations.py:39-96). False = the policy
        drives the WHOLE episode — for experts trained with episodes long
        enough to pay for their own landing (the pose-hold autopilot
        cannot recover the PEA re-hop's asymmetric second touchdown;
        landing needs state feedback — scripts/diag_bc_multi.py,
        diag_ars_land.py). The landing flag then follows the reference's
        landing_started semantics (switched controller & descending,
        get_demonstration_wrapper.py:45-47), latched one-way.
    Returns:
      (rows (max_steps, row_dim), valid (max_steps,) bool, final env state)
    """
    from quadruped_springs_tpu.control import interfaces as ci

    if rest_duration is None:
        rest_duration = 1.0 if env.config.enable_springs else 0.3
    n_ramp = max(int(rest_duration / env.env_time_step), 1)
    # Landing hold: the DEEP-CROUCH pose the reference authors left as the
    # commented-out alternative (configs_go1_with_springs.py:37,
    # [0, 1.0, -2.1]) with raised damping. The active reference choice
    # (landing pose = standing pose, :38) tips over in THIS simulator: the
    # PEA springs return the impact energy as a ~6 cm re-hop whose second,
    # asymmetric touchdown falls over under any pose-hold gains — measured
    # sweep in scripts/diag_landing_sweep.py (stand kp75/kd1 and kp60/kd3
    # both terminate with invalid contact; crouch kp60/kd3 settles into
    # stable stance at h=0.27 within 0.7 s of touchdown).
    landing_action = (ci.command_to_action(
        env.iface, jnp.asarray([0.0, 1.0, -2.1] * 4))
        if env.config.enable_springs else env.get_landing_action())
    rest_action = env.get_init_action()
    # NO gain switching anywhere (unlike GoToRestWrapper's temporary
    # kp=60/kd=0.8, go_to_rest_wrapper.py:22-41): demo rows record ACTIONS
    # only, so any phase executed under special gains is un-clonable — the
    # BC policy replays the same actions under the default gains and the
    # dynamics diverge exactly at the landing (measured: a kd=3-recorded
    # landing replayed at default kd tips over, apex mean 0.55 -> 0.23).
    # With the crouch landing pose the default gains are stable.

    state0, obs0 = env.reset(key)

    def step_fn(carry, _):
        state, obs, phase, held, peak_deadline, rest_i, settle, done = carry

        pol_a = policy_fn(obs)
        ramp = jnp.minimum((rest_i + 1.0) / n_ramp, 1.0)
        rest_a = held * (1 - ramp) + ramp * rest_action
        if autopilot:
            action = jnp.select(
                [phase == PHASE_POLICY, phase == PHASE_TAKEOFF,
                 phase == PHASE_LANDING, phase == PHASE_REST],
                [pol_a, held, landing_action, rest_a])
        else:
            action = pol_a
        state2, obs2, r, d2, info = env.step(state, action)

        t = env.sim_time(state2)
        switched = state2.task.switched_controller
        # phase transitions (landing_wrapper.py / go_to_rest_wrapper.py);
        # with autopilot=False the phase tracks the SAME milestones (for
        # the recorded landing flag) but control stays with the policy
        new_deadline = t + state2.robot.lin_vel[2] / _G
        descending = state2.robot.lin_vel[2] <= 0.0
        enter_takeoff = ((phase == PHASE_POLICY) & switched
                         if autopilot else
                         (phase == PHASE_POLICY) & switched & descending)
        phase2 = jnp.where(enter_takeoff,
                           PHASE_TAKEOFF if autopilot else PHASE_LANDING,
                           phase)
        peak_deadline = jnp.where(enter_takeoff, new_deadline, peak_deadline)
        held2 = jnp.where(enter_takeoff, action, held)
        phase2 = jnp.where((phase2 == PHASE_TAKEOFF) & (t >= peak_deadline),
                           PHASE_LANDING, phase2)
        # Rest trigger: the reference's rest_condition
        # (go_to_rest_wrapper.py:89-95) fires on all-feet + height-rising,
        # i.e. the instant of post-impact rebound — here that instant is
        # the START of the spring re-hop, and ramping through the hop
        # lands mid-ramp in an extended pose and falls (measured,
        # scripts/diag_autopilot.py). The trigger therefore waits for the
        # settled version of the same condition: all four feet grounded
        # with |vz| < 0.08 m/s for 10 consecutive control steps.
        quiet = (jnp.all(state2.feet_in_contact)
                 & (jnp.abs(state2.robot.lin_vel[2]) < 0.08))
        settle2 = jnp.where(quiet, settle + 1, 0)
        landed = (phase2 == PHASE_LANDING) & (settle2 >= 10)
        phase2 = jnp.where(landed, PHASE_REST, phase2)
        # ramp starts from the CURRENT pose (get_start_action,
        # go_to_rest_wrapper.py:55-57), not the landing action
        start_a = ci.command_to_action(env.iface, state2.robot.q)
        held2 = jnp.where(landed, start_a, held2)
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
                 peak_deadline, rest_i2, settle2, done | d2),
                (row, valid))

    init = (state0, obs0, jnp.asarray(PHASE_POLICY), jnp.zeros(env.action_dim),
            jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(0),
            jnp.asarray(False))
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
