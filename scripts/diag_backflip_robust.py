"""Diagnose robust-backflip failures scenario by scenario.

For each randomized scenario seed: run the frozen linear launch through
the v2 autopilot to touchdown, record the HANDOFF state (attitude,
rates, unwrapped pitch), then run the MLP lander and record the final
pose. Separates the two failure classes the save bars conflate:
  (a) irrecoverable handoff (launch under-rotates so far the robot
      touches down on its back/side — no lander can right it without a
      get-up maneuver), vs
  (b) lander capacity (touchdown near-upright, final pose still tilted).

Usage: python scripts/diag_backflip_robust.py [--cpu]
           [--mlp examples/policies/backflip_landing_mlp.npz.cand.npz]
           [--seeds 77000 12]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--mlp", default="examples/policies/backflip_landing_mlp.npz")
ap.add_argument("--seeds", nargs=2, type=int, default=[77000, 12],
                metavar=("BASE", "N"))
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.env import wrappers as wr
from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.models import spatial as sp
from quadruped_springs_tpu.train import normalize as vnorm
from quadruped_springs_tpu.train.networks import linear_policy_apply

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="BACKFLIP",
    observation_space_mode="ARS_BACKFLIP", action_space_mode="SYMMETRIC",
    obs_noise=True, max_ep_len=4.0, env_randomizer_mode="TEST_RANDOMIZER"))
w = wr.LandingWrapperBackflip(env, variant="until_grounded")

d = np.load(os.path.join(HERE, "examples/policies/backflip_ars.npz"))
W = jnp.asarray(d["W"])
on = vnorm.RunningNorm(mean=jnp.asarray(d["mean"]), var=jnp.asarray(d["var"]),
                       count=jnp.asarray(d["count"]))
m = np.load(os.path.join(HERE, args.mlp))
mlp = {k: jnp.asarray(m[k]) for k in ("W1", "b1", "W2", "b2")}


def mlp_apply(o):
    h = jnp.tanh(mlp["W1"] @ o + mlp["b1"])
    return jnp.clip(mlp["W2"] @ h + mlp["b2"], -1.0, 1.0)


base, n = args.seeds
n_ok = 0
for seed in range(base, base + n):
    state, obs = env.reset(jax.random.PRNGKey(seed))
    wstate = w.init_state()
    handoff = None
    for i in range(120):
        o = vnorm.normalize(on, obs)
        a = linear_policy_apply(W, o) if bool(wstate.armed) else mlp_apply(o)
        was_armed = bool(wstate.armed)
        out, wstate = w.step(state, a, wstate)
        state, obs = out.state, out.obs
        if was_armed and not bool(wstate.armed):
            R = np.asarray(sp.quat_to_mat(state.robot.quat))
            handoff = {
                "step": i,
                "up_z": float(R[2, 2]),
                "z": float(state.robot.pos[2]),
                "pitch_deg": float(np.degrees(state.task.max_pitch_bf)),
                "wy": float(state.robot.ang_vel[1]),
            }
        if bool(out.done):
            break
    R = np.asarray(sp.quat_to_mat(state.robot.quat))
    rot = float(state.task.max_pitch_bf) >= 2 * np.pi - 0.1
    upright = R[2, 2] > 0.85 and float(state.robot.pos[2]) > 0.15
    ok = rot and upright
    n_ok += int(ok)
    h = handoff or {"step": -1, "up_z": float("nan"), "z": float("nan"),
                    "pitch_deg": float("nan"), "wy": float("nan")}
    print(f"seed {seed}: handoff@{h['step']:3d} up_z {h['up_z']:+.2f} "
          f"z {h['z']:.2f} pitch {h['pitch_deg']:.0f} wy {h['wy']:+.1f} | "
          f"final up_z {R[2, 2]:+.2f} z {float(state.robot.pos[2]):.2f} "
          f"pitch {np.degrees(float(state.task.max_pitch_bf)):.0f} "
          f"{'OK' if ok else ('ROT-MISS' if not rot else 'TILT')}",
          flush=True)
print(f"{n_ok}/{n} pass the strict gate")
