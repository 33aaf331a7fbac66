"""Closed-loop backflip on the stiff 1 kHz simulator.

Reference architecture (landing_wrapper_backflip.py + an RL launch
policy): the policy crouches and fires the explosive extension; once the
task detects take-off (flying & time-to-peak > 0.06 s,
task_base.py:152-160) the LandingWrapperBackflip autopilot drives the
fixed take-off action until the unwrapped pitch passes 5π/8, then holds
the landing action to touchdown. Here the launch comes from a scripted
crouch + the MPC-style rear-biased extension; success = unwrapped pitch
≥ 2π (task.max_pitch_bf) and an upright final pose.

Usage: python examples/run_backflip_closed_loop.py [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--crouch-knots", type=int, default=8)
    ap.add_argument("--max-steps", type=int, default=60)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from quadruped_springs_tpu.env import wrappers as wr
    from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
    from quadruped_springs_tpu.models import spatial as sp

    env = QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="BACKFLIP",
        observation_space_mode="ARS_BACKFLIP",
        action_space_mode="SYMMETRIC", obs_noise=False, max_ep_len=4.0))
    w = wr.LandingWrapperBackflip(env, variant="hold")

    crouch = jnp.array([0.0, 0.5, -0.9, 0.0, 0.5, -0.9])
    launch = jnp.array([0.0, -0.3, 0.7, 0.0, -1.0, 1.0])

    state, _ = env.reset(jax.random.PRNGKey(0))
    out = None
    for i in range(args.max_steps):
        frac = min((i + 1) / args.crouch_knots, 1.0)
        a = frac * crouch if i < args.crouch_knots else launch
        out = w.step(state, a)
        state = out.state
        if bool(out.done):
            break

    ts = state.task
    pitch_bf = float(ts.max_pitch_bf)
    rpy = np.asarray(sp.quat_to_rpy(state.robot.quat))
    upright = (abs(rpy[0]) < 0.4
               and (abs(rpy[1]) < 0.5 or abs(abs(rpy[1]) - 2 * np.pi) < 0.5)
               and float(state.robot.pos[2]) > 0.15)
    print(f"unwrapped pitch max: {pitch_bf:.2f} rad "
          f"({np.degrees(pitch_bf):.0f} deg)")
    print(f"apex height: {float(ts.relative_max_height):.3f} m (relative)")
    print(f"final pos z {float(state.robot.pos[2]):.3f}, rpy {rpy.round(2)}")
    print(f"full rotation (>=2*pi): {pitch_bf >= 2 * np.pi - 0.1}")
    print(f"lands upright: {upright}")
    print(f"done at control step {i}, sim time "
          f"{float(env.sim_time(state)):.2f} s")


if __name__ == "__main__":
    main()
