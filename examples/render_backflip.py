"""Render the learned closed-loop backflip to a gif — the counterpart of
the reference's README result videos (README.md:11-17), produced through
the VideoRec-equivalent consumer (utils/render.py) with the BACKFLIP
camera track.

The launch policy is examples/policies/backflip_ars.npz (see
scripts/train_behavior_policies.py); after the take-off switch the
LandingWrapperBackflip autopilot rule is replayed at control-step
granularity (fixed take-off action until unwrapped pitch >= 5pi/8, then
the landing hold — landing_wrapper_backflip.py:8-81) so every simulation
step lands in the recording.

Usage: python examples/render_backflip.py [--cpu] [--out examples/out/backflip.gif]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax


def run(out_path: str = "examples/out/backflip.gif", seed: int = 0,
        verbose: bool = True):
    import jax.numpy as jnp
    import numpy as np

    from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
    from quadruped_springs_tpu.env.wrappers import LandingWrapperBackflip
    from quadruped_springs_tpu.models import spatial as sp
    from quadruped_springs_tpu.train import normalize as vnorm
    from quadruped_springs_tpu.train.networks import linear_policy_apply
    from quadruped_springs_tpu.utils import render

    d = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "policies", "backflip_ars.npz"))
    W = jnp.asarray(d["W"])
    on = vnorm.RunningNorm(mean=jnp.asarray(d["mean"]),
                           var=jnp.asarray(d["var"]),
                           count=jnp.asarray(d["count"]))

    env = QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="BACKFLIP",
        observation_space_mode="ARS_BACKFLIP",
        action_space_mode="SYMMETRIC", obs_noise=False, max_ep_len=4.0))
    state, obs = env.reset(jax.random.PRNGKey(seed))

    q, base_pos, base_rpy = [], [], []
    take_off = LandingWrapperBackflip.TAKE_OFF_ACTION
    thresh = float(LandingWrapperBackflip.PITCH_THRESHOLD)
    landing = env.get_landing_action()

    step = jax.jit(env.step)
    for _ in range(220):
        switched = bool(state.task.switched_controller)
        if not switched:
            a = linear_policy_apply(W, vnorm.normalize(on, obs))
        else:
            pitch = float(sp.pitch_unwrapped_yxz(
                state.robot.quat, state.task.switched_controller))
            a = take_off if pitch < thresh else landing
        state, obs, _, done, _ = step(state, a)
        q.append(np.asarray(state.robot.q))
        base_pos.append(np.asarray(state.robot.pos))
        base_rpy.append(np.asarray(sp.quat_to_rpy(state.robot.quat)))
        if bool(done):
            break

    recs = {
        "q": np.stack(q),
        "base_pos": np.stack(base_pos),
        "base_rpy": np.stack(base_rpy),
        "valid": np.ones(len(q), bool),
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    path = render.render_rollout(recs, out_path, camera_mode="BACKFLIP",
                                 stride=2, fps=25)
    if verbose:
        import math
        print(f"steps recorded: {len(q)}")
        print(f"max unwrapped pitch: "
              f"{math.degrees(float(state.task.max_pitch_bf)):.0f} deg")
        print(f"wrote {path} ({os.path.getsize(path)} bytes)")
    return path, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="examples/out/backflip.gif")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    run(args.out)


if __name__ == "__main__":
    main()
