"""Branch-free flattened backflip episode: the hybrid autopilot phase
machine as mode scheduling inside one `lax.scan`.

`LandingWrapperBackflip(variant="until_grounded")` (wrappers.py, reference
landing_wrapper_backflip2.py) drives an episode with nested `while_loop`s
inside each policy step — correct for deployment, but the data-dependent
loop trip counts make the episode impossible to `vmap` (every lane would
need its own trip count), which forced robust-backflip training into
Python-level per-episode loops (one bool() device sync per knot).

This module re-expresses the SAME phase machine as per-knot action
selection driven by monotone phase flags (SURVEY §7 "hard parts" #5: the
wrapper phase machine as mode-scheduled horizons rather than Python
loops):

  LAUNCH   task not switched            -> launch_fn(obs)
  FLIP     switched, pitch < 5π/8       -> TAKE_OFF_ACTION
           (do-while parity: ≥1 flip knot even if pitch already past the
           threshold at the switch instant, landing_wrapper_backflip.py:38-44)
  DESCENT  pitch passed, still flying   -> landing action
  LANDED   grounded after the flip      -> lander_fn(obs)

Because each env.step is identical and the action source per sim knot
matches the wrapper's, the flattened episode reproduces the wrapper-driven
trajectory exactly up to float reassociation (same env.step call sequence
-> same PRNG stream -> same noisy obs) — gated in
tests/test_wrapper_parity.py. The payoff: whole
episodes become one fixed-length scan, vmappable across randomized
scenarios, so robust-behavior training runs lane-parallel on the TPU
instead of one Python episode at a time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from quadruped_springs_tpu.env.env import EnvState, QuadrupedEnv
from quadruped_springs_tpu.env.wrappers import LandingWrapperBackflip
from quadruped_springs_tpu.models import spatial as sp


@struct.dataclass
class BackflipPhase:
    """Monotone per-episode phase flags (all () bool)."""
    flip_stepped: jnp.ndarray   # ≥1 TAKE_OFF knot taken (do-while parity)
    pitch_passed: jnp.ndarray   # unwrapped pitch reached 5π/8 post-switch
    returned: jnp.ndarray       # grounded after the flip — control is back
    done: jnp.ndarray           # episode ended (state frozen from here on)


def init_phase() -> BackflipPhase:
    f = jnp.asarray(False)
    return BackflipPhase(flip_stepped=f, pitch_passed=f, returned=f, done=f)


def _select(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def backflip_episode(env: QuadrupedEnv, launch_fn, lander_fn,
                     state0: EnvState, obs0: jnp.ndarray, n_knots: int,
                     record_rows: bool = False):
    """Run one flattened backflip episode for a fixed n_knots.

    launch_fn/lander_fn: obs -> action in [-1,1]^6 (normalization inside).
    Deliberately NOT jitted here: the policy closures routinely capture
    tracers (trainers differentiate / vmap through the whole episode), so
    callers jit/vmap the composition themselves.
    Returns (final_state_frozen_at_done, final_phase, traj) where traj is a
    dict of per-knot stacks: obs (input to the knot), action, phase code
    (0 launch / 1 flip / 2 descent / 3 landed), up_z, z, done, returned,
    reward — plus, with record_rows=True, "row": demonstration rows in the
    reference layout (get_demonstration_wrapper.py:36-52 — filtered action
    + full post-step robot state + landing flag), so flattened flip
    episodes double as the backflip demo collector (get_demonstrations.py
    role for the BACKFLIP task).
    """
    from quadruped_springs_tpu.utils import demo as demo_util
    take_off = LandingWrapperBackflip.TAKE_OFF_ACTION
    thr = LandingWrapperBackflip.PITCH_THRESHOLD
    landing = jnp.asarray(env.get_landing_action())

    def knot(carry, _):
        state, obs, ph = carry
        switched = state.task.switched_controller
        in_flip = switched & ~ph.pitch_passed
        in_descent = ph.pitch_passed & ~ph.returned
        phase_code = jnp.where(
            ph.returned, 3, jnp.where(in_descent, 2, jnp.where(in_flip, 1, 0)))
        action = jnp.where(
            ph.returned, lander_fn(obs),
            jnp.where(in_descent, landing,
                      jnp.where(in_flip, take_off, launch_fn(obs))))
        state2, obs2, r, d, _ = env.step(state, action)
        # flag updates mirror the wrapper's post-step checks
        flip_stepped = ph.flip_stepped | in_flip
        pitch = sp.pitch_unwrapped_yxz(state2.robot.quat,
                                       state2.task.switched_controller)
        pitch_passed = ph.pitch_passed | (flip_stepped & (pitch >= thr))
        flying = ~jnp.any(state2.feet_in_contact)
        returned = ph.returned | (pitch_passed & ~flying)
        ph2 = BackflipPhase(flip_stepped=flip_stepped,
                            pitch_passed=pitch_passed,
                            returned=returned, done=ph.done | d)
        # freeze at the first done knot: the episode's final pose is the
        # state AT done (what the deployed gate measures)
        state_n = _select(ph.done, state, state2)
        obs_n = _select(ph.done, obs, obs2)
        ph_n = _select(ph.done, ph, ph2)
        R22 = sp.quat_to_mat(state_n.robot.quat)[2, 2]
        out = {"obs": obs, "action": action, "phase": phase_code,
               "up_z": R22, "z": state_n.robot.pos[2],
               "done": ph_n.done, "returned": ph_n.returned,
               "reward": jnp.where(ph.done, 0.0, r)}
        if record_rows:
            # landing flag follows the reference's landing_started
            # semantics (switched & descending, latched — here: the
            # descent phase onward); rows past done are marked invalid
            out["row"] = demo_util.demo_row(
                state_n.last_filtered_action, state_n.robot, ph_n.pitch_passed)
            out["row_valid"] = ~ph.done
        return (state_n, obs_n, ph_n), out

    (state_f, _, ph_f), traj = jax.lax.scan(
        knot, (state0, obs0, init_phase()), None, length=n_knots)
    return state_f, ph_f, traj
