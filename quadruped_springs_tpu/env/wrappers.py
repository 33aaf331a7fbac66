"""Wrappers — hybrid-control behavior composition as functional machines.

TPU-native re-design of env/wrappers/* : the reference wrappers run Python
while-loops of env.step inside one policy step (e.g. LandingWrapper holds
the last action until the flight peak, then holds a fixed landing action
until the episode ends, landing_wrapper.py:38-69). Here each wrapper is a
pure function built from `lax.while_loop` / mode flags over the functional
env — so a wrapped policy step is still a single jittable program.

Implemented surface:
  * LandingWrapper (+"2" variant exit criterion) — take-off/landing phases
    with the temporary kp=60/kd=1.5 gain switch (landing_wrapper.py:18-36).
  * LandingWrapperBackflip(2) — fixed take-off action [0,1,-1]×2 until
    pitch ≥ 5π/8, then landing hold (landing_wrapper_backflip.py:8-81).
  * LandingWrapperContinuous(2) — per-jump re-arming autopilot.
  * GoToRestWrapper — after landing, ramp the action to the init pose over
    1.0 s (springs) / 0.3 s (go_to_rest_wrapper.py:8-95).
  * ObsFlatteningWrapper — identity here: observations are already flat
    vectors (obs_flattening_wrapper.py:11-20 flattens the reference's dict).
  * EvaluationWrapper — KPI extraction (max height / max fwd / feet forces)
    is returned in `info` by QuadrupedEnv.step already; `episode_metrics`
    aggregates them over a rollout.
  * GetDemonstration/SaveDemo/RSI live in utils/demo.py (dataset I/O) and
    QuadrupedEnv.reset(desired_robot_state=...) (exact state injection).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from quadruped_springs_tpu.env.env import EnvState, QuadrupedEnv

LANDING_KP = 60.0   # landing_wrapper.py:22-26
LANDING_KD = 1.5
_G = 9.81


@struct.dataclass
class StepOut:
    state: EnvState
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    max_height: jnp.ndarray
    max_fwd: jnp.ndarray


def _pack(env, out):
    state, obs, reward, done, info = out
    return StepOut(state, obs, reward, done, info["max_height"], info["max_fwd"])


class LandingWrapper:
    """Post-take-off autopilot (landing_wrapper.py / landing_wrapper_2.py).

    variant="peak_timer": take-off phase repeats the action until the
      vz/g peak timer elapses (v1).
    variant="until_grounded": take-off phase ends when no longer flying (v2).
    """

    def __init__(self, env: QuadrupedEnv, variant: str = "peak_timer"):
        self.env = env
        self.variant = variant
        self.landing_action = env.get_landing_action()
        kp12 = jnp.full(12, LANDING_KP)
        kd12 = jnp.full(12, LANDING_KD)
        self._landing_gains = (kp12, kd12)

    @partial(jax.jit, static_argnums=0)
    def step(self, state: EnvState, action: jnp.ndarray):
        env = self.env
        out = _pack(env, env.step(state, action))

        def take_off_and_land(out: StepOut) -> StepOut:
            # --- take-off phase: repeat action until peak (or grounded) ---
            t_peak = out.state.robot.lin_vel[2] / _G
            deadline = env.sim_time(out.state) + t_peak

            def cond_take_off(o):
                if self.variant == "until_grounded":
                    flying = ~jnp.any(o.state.feet_in_contact)
                    return flying & ~o.done
                return (env.sim_time(o.state) < deadline) & ~o.done

            def body_take_off(o):
                return _pack(env, env.step(o.state, action))

            out = jax.lax.while_loop(cond_take_off, body_take_off, out)

            # --- landing phase: hold landing action, soft gains, to the end
            def cond_land(o):
                return ~o.done

            def body_land(o):
                kp, kd = self._landing_gains
                return _pack(env, env.step(o.state, self.landing_action,
                                           kp=kp, kd=kd))

            return jax.lax.while_loop(cond_land, body_land, out)

        switched = out.state.task.switched_controller & ~out.done
        return jax.lax.cond(switched, take_off_and_land, lambda o: o, out)

    def reset(self, key):
        return self.env.reset(key)


@struct.dataclass
class BackflipLandingState:
    armed: jnp.ndarray  # () bool — v2's one-shot _enable_landing flag


class LandingWrapperBackflip:
    """Backflip autopilot. Once the task triggers, drive the fixed take-off
    action [0,1,-1]*2 until the unwrapped pitch exceeds 5π/8, then the
    landing phase holds the landing action. Neither reference variant
    switches motor gains (their decorator is commented out,
    landing_wrapper_backflip.py:46, landing_wrapper_backflip2.py:46).

    variant="hold" (v1, landing_wrapper_backflip.py:47-52): landing phase
      loops until episode end; the autopilot can re-trigger.
    variant="until_grounded" (v2, landing_wrapper_backflip2.py:50,72-83):
      landing phase exits as soon as the robot stops flying, and the
      autopilot is one-shot per episode (`_enable_landing`) — carry the
      BackflipLandingState returned by init_state()/step().
    """

    TAKE_OFF_ACTION = jnp.array([0.0, 1.0, -1.0, 0.0, 1.0, -1.0])
    PITCH_THRESHOLD = 5 * jnp.pi / 8

    def __init__(self, env: QuadrupedEnv, variant: str = "hold"):
        if env.action_dim != 6:
            raise ValueError("backflip landing wrapper expects SYMMETRIC actions")
        if variant not in ("hold", "until_grounded"):
            raise ValueError(f"unknown variant {variant!r}")
        self.env = env
        self.variant = variant
        self.landing_action = env.get_landing_action()

    def init_state(self) -> BackflipLandingState:
        """v2's per-episode arming flag (landing_wrapper_backflip2.py:82)."""
        return BackflipLandingState(armed=jnp.asarray(True))

    def _autopilot(self, out: StepOut) -> StepOut:
        env = self.env
        from quadruped_springs_tpu.models import spatial as sp

        def pitch(o):
            return sp.pitch_unwrapped_yxz(
                o.state.robot.quat, o.state.task.switched_controller)

        def cond_flip(o):
            return (pitch(o) < self.PITCH_THRESHOLD) & ~o.done

        def body_flip(o):
            return _pack(env, env.step(o.state, self.TAKE_OFF_ACTION))

        # do-while: the reference take_off_phase always steps at least once
        # before checking the trigger (landing_wrapper_backflip.py:38-44),
        # so run one body step unconditionally (matters when unwrapped
        # pitch already exceeds the threshold at the trigger instant)
        out = jax.lax.while_loop(
            cond_flip, body_flip,
            jax.lax.cond(out.done, lambda o: o, body_flip, out))

        def body_land(o):
            return _pack(env, env.step(o.state, self.landing_action))

        if self.variant == "until_grounded":
            def cond_land(o):
                flying = ~jnp.any(o.state.feet_in_contact)
                return flying & ~o.done
        else:
            def cond_land(o):
                return ~o.done

        return jax.lax.while_loop(cond_land, body_land, out)

    @partial(jax.jit, static_argnums=0)
    def step(self, state: EnvState, action: jnp.ndarray,
             wstate: BackflipLandingState | None = None):
        """One policy step. For variant="until_grounded" pass and re-carry
        `wstate`; returns (StepOut, new_wstate) then, plain StepOut for v1."""
        env = self.env
        out = _pack(env, env.step(state, action))
        armed = jnp.asarray(True) if wstate is None else wstate.armed
        switched = out.state.task.switched_controller & ~out.done & armed
        out2 = jax.lax.cond(switched, self._autopilot, lambda o: o, out)
        if self.variant == "until_grounded":
            new_w = BackflipLandingState(armed=armed & ~switched)
            return out2, new_w
        return out2

    def reset(self, key):
        return self.env.reset(key)


@struct.dataclass
class ContinuousLandingState:
    armed: jnp.ndarray  # () bool — autopilot re-arms every jump


class LandingWrapperContinuous:
    """Per-jump autopilot for continuous jumping
    (landing_wrapper_continuous.py / *2.py): when a jump is detected, repeat
    the action to the peak (v1 then holds the landing action until the jump
    ends); re-arms on every jump."""

    def __init__(self, env: QuadrupedEnv, hold_landing: bool = True):
        self.env = env
        self.hold_landing = hold_landing
        self.landing_action = env.get_landing_action()

    def init_state(self) -> ContinuousLandingState:
        return ContinuousLandingState(armed=jnp.asarray(True))

    @partial(jax.jit, static_argnums=0)
    def step(self, state: EnvState, wstate: ContinuousLandingState,
             action: jnp.ndarray):
        env = self.env
        out = _pack(env, env.step(state, action))

        def autopilot(out: StepOut) -> StepOut:
            t_peak = out.state.robot.lin_vel[2] / _G
            deadline = env.sim_time(out.state) + t_peak

            def cond_up(o):
                return (env.sim_time(o.state) < deadline) & ~o.done

            out = jax.lax.while_loop(
                cond_up, lambda o: _pack(env, env.step(o.state, action)), out)

            if self.hold_landing:
                def cond_down(o):
                    flying = ~jnp.any(o.state.feet_in_contact)
                    return flying & ~o.done

                out = jax.lax.while_loop(
                    cond_down,
                    lambda o: _pack(env, env.step(o.state, self.landing_action)),
                    out)
            return out

        jumping = out.state.task.is_jumping & wstate.armed & ~out.done
        out2 = jax.lax.cond(jumping, autopilot, lambda o: o, out)
        new_w = ContinuousLandingState(armed=jnp.asarray(True))
        return out2, new_w

    def reset(self, key):
        return self.env.reset(key)


@struct.dataclass
class GoToRestState:
    h_prev: jnp.ndarray  # () previous control step's base height


class GoToRestWrapper:
    """After the jump has landed, ramp the action to the init pose
    (go_to_rest_wrapper.py:8-95; ramp 1.0 s with springs, 0.3 s without).

    The per-step trigger `rest_condition` mirrors go_to_rest_wrapper.py:89-95:
    controller has switched (a jump happened) AND all four feet are in
    contact AND the base height rose since the previous control step (the
    post-impact rebound — "stopped falling"). step() carries GoToRestState
    (the previous height) and runs the rest phase via lax.cond when the
    condition fires. The rest phase uses the temporary soft-gain switch of
    go_to_rest_wrapper.py:22-41 (kp=60; kd=0.8 springs / 1.5 without).
    """

    def __init__(self, env: QuadrupedEnv):
        self.env = env
        springs = env.config.enable_springs
        self.duration = 1.0 if springs else 0.3
        self.n_ramp = max(int(self.duration / env.env_time_step), 1)
        self.target_action = env.get_init_action()
        self._rest_gains = (jnp.full(12, 60.0),
                            jnp.full(12, 0.8 if springs else 1.5))

    def init_state(self, state: EnvState) -> GoToRestState:
        return GoToRestState(h_prev=state.robot.pos[2])

    def rest_condition(self, h_prev: jnp.ndarray, out: StepOut) -> jnp.ndarray:
        """go_to_rest_wrapper.py:89-95 — jumped + grounded + height rising."""
        grounded = jnp.all(out.state.feet_in_contact)
        has_jumped = out.state.task.switched_controller
        stopped_landing = (out.state.robot.pos[2] - h_prev) > 0
        return has_jumped & grounded & stopped_landing

    @partial(jax.jit, static_argnums=0)
    def step(self, state: EnvState, wstate: GoToRestState,
             action: jnp.ndarray):
        """One policy step with the rest trigger; returns (StepOut, wstate)."""
        env = self.env
        out = _pack(env, env.step(state, action))
        trigger = self.rest_condition(wstate.h_prev, out) & ~out.done

        def to_rest(o: StepOut) -> StepOut:
            from quadruped_springs_tpu.control import interfaces as ci
            start = ci.command_to_action(env.iface, o.state.robot.q)
            return self.rest_phase(o.state, start, _pre=o)

        out2 = jax.lax.cond(trigger, to_rest, lambda o: o, out)
        return out2, GoToRestState(h_prev=out2.state.robot.pos[2])

    @partial(jax.jit, static_argnums=0)
    def rest_phase(self, state: EnvState, start_action: jnp.ndarray,
                   _pre: StepOut | None = None):
        """Ramp start→init action over the duration, then hold the init
        action until episode end (the reference loops `while not done`,
        go_to_rest_wrapper.py:74-78). Returns the final StepOut."""
        env = self.env
        kp, kd = self._rest_gains
        if _pre is None:
            out = _pack(env, env.step(state, start_action, kp=kp, kd=kd))
        else:
            out = _pre

        def body_ramp(i, o):
            frac = jnp.minimum((i + 1.0) / self.n_ramp, 1.0)
            a = start_action * (1 - frac) + frac * self.target_action
            nxt = _pack(env, env.step(o.state, a, kp=kp, kd=kd))
            return jax.tree.map(lambda x, y: jnp.where(o.done, x, y), o, nxt)

        out = jax.lax.fori_loop(0, self.n_ramp, body_ramp, out)

        def body_hold(o):
            return _pack(env, env.step(o.state, self.target_action,
                                       kp=kp, kd=kd))

        return jax.lax.while_loop(lambda o: ~o.done, body_hold, out)


class RestTruncationWrapper:
    """Truncate the episode when the reference's rest condition fires
    (go_to_rest_wrapper.py:89-95: a jump happened AND all feet grounded
    AND the base height rose since the previous control step).

    This is the agent-visible MDP of the reference's training stack: once
    GoToRestWrapper triggers, its autopilot loops env.step internally
    until the episode ends and DISCARDS every intermediate reward
    (go_to_rest_wrapper.py:74-78 returns only the last step), so from the
    policy's perspective the episode ends at landing. Training the dense
    *_PPO fine-tune stage on the raw env instead exposes the full
    post-landing horizon, where standing pays ~0.011/step for the rest of
    the episode — measured on JUMPING_IN_PLACE_PPO: standing returns
    +2.09 over 2 s vs +0.18 for a real 0.5 m jump that crashes
    post-landing (scripts/diag_economics.py), so PPO *correctly* unlearns
    jumping. With rest truncation the standing stream is structurally
    removed from jumping rollouts and the within-basin gradient points
    toward higher jumps.

    Interface-compatible with QuadrupedEnv.step/reset (no wrapper state:
    "height rose since the previous control step" falls out of comparing
    the pre-step and post-step states); attribute access delegates to the
    wrapped env, so the trainers use it as a drop-in env.
    """

    def __init__(self, env: QuadrupedEnv):
        self.env = env

    def __getattr__(self, name):
        return getattr(self.env, name)

    def step(self, state: EnvState, action: jnp.ndarray, **kw):
        state2, obs, reward, done, info = self.env.step(state, action, **kw)
        rest = (state2.task.switched_controller
                & jnp.all(state2.feet_in_contact)
                & ((state2.robot.pos[2] - state.robot.pos[2]) > 0))
        return state2, obs, reward, done | rest, info

    def reset(self, key, **kw):
        return self.env.reset(key, **kw)


def episode_metrics(rewards, infos):
    """EvaluationWrapper-style episode KPIs from stacked step outputs."""
    return {
        "return": jnp.sum(rewards),
        "max_height": jnp.max(infos["max_height"]),
        "max_fwd": jnp.max(infos["max_fwd"]),
        "peak_feet_force": jnp.max(jnp.sum(infos["feet_forces"], axis=-1)),
    }
