"""Rigid vs PEA comparison — the project's namesake differentiator
(VERDICT r3 next #5): the same MPPI solver, on the same JUMPING_IN_PLACE
task, planning for the spring-equipped robot vs the rigid baseline
(configs_go1_with/without_springs.py), each plan executed open-loop on
its own stiff 1 kHz model.

The springs store crouch energy in the parallel elastic elements and
return it during extension (springs.py:34-79 one-sided law), so the same
torque budget (same [23.7, 23.7, 33.55] N·m limits both configs) should
buy a higher apex — the claim of the reference's paper, measured here
mechanically.

Usage: python scripts/compare_springs.py [--cpu]
Writes docs/springs_vs_rigid.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--out", default="docs/springs_vs_rigid.json")
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.solver import mppi
from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem, state_to_vec
from quadruped_springs_tpu.utils import verification as V

N_SOLVES = 8  # MPPI is stochastic; single solves are too noisy to compare


def _ballistic_apex(xs):
    z, vz = xs[:, 2], xs[:, 9]
    return jnp.max(z + jnp.maximum(vz, 0.0) ** 2 / (2 * 9.81))


rows = {}
for springs in (True, False):
    label = "springs" if springs else "rigid"
    t0 = time.time()
    prob = MPCProblem(MPCConfig(task="JUMPING_IN_PLACE", horizon=50,
                                iterations=10, n_alphas=8,
                                enable_springs=springs))
    env = V.fidelity_env("JUMPING_IN_PLACE", enable_springs=springs)
    state, _ = env.reset(jax.random.PRNGKey(0))
    x0 = state_to_vec(state.robot)
    u0 = prob.task_warm_start()
    mcfg = mppi.MPPIConfig(horizon=50, iterations=10)
    keys = jax.random.split(jax.random.PRNGKey(1), N_SOLVES)
    sols = jax.jit(jax.vmap(
        lambda k: prob.solve_mppi(x0, u0, k, mcfg)))(keys)
    # plans launch as late in the horizon as pays, so realized z
    # under-measures the jump: use the ballistic apex predictor
    apexes = jax.vmap(_ballistic_apex)(sols.xs)
    best = int(jnp.argmin(sols.cost))
    us = sols.us[best]
    # extend execution past the 0.5 s plan so the jump completes and
    # lands: hold the landing action (the autopilot's hold,
    # landing_wrapper.py:38-69) for another 0.7 s
    land = env.get_landing_action()
    us_full = jnp.concatenate(
        [us, jnp.broadcast_to(land, (70,) + land.shape)], axis=0)
    trace = np.asarray(V.record_golden_trace(env, us_full, jax.random.PRNGKey(2)))
    got = V.split_trace(trace, env.action_dim)
    z = got["pos"][:, 2]
    tau = got["tau"]
    # peak |tau| and total positive mechanical work by the MOTORS
    # (spring work is free — that's the point)
    qd = got["qd"]
    motor_power = np.maximum(np.sum(tau * qd, axis=1), 0.0)
    rows[label] = {
        "n_solves": N_SOLVES,
        "planned_apex_best_m": round(float(apexes[best]), 3),
        "planned_apex_mean_m": round(float(jnp.mean(apexes)), 3),
        "planned_apex_max_m": round(float(jnp.max(apexes)), 3),
        "best_cost": round(float(sols.cost[best]), 2),
        "mean_cost": round(float(jnp.mean(sols.cost)), 2),
        "executed_apex_m": round(float(z.max()), 3),
        "peak_motor_torque_Nm": round(float(np.abs(tau).max()), 2),
        "motor_work_J": round(float(motor_power.sum()) * 0.01, 2),
        "final_z_m": round(float(z[-1]), 3),
        "upright": bool(abs(got["quat"][-1, 0]) + abs(got["quat"][-1, 1]) < 0.5),
        "wall_s": round(time.time() - t0, 1),
    }
    print(label, json.dumps(rows[label]), flush=True)

s, r = rows["springs"], rows["rigid"]
rows["summary"] = {
    "apex_gain_m": round(s["executed_apex_m"] - r["executed_apex_m"], 3),
    "apex_gain_pct": round(100 * (s["executed_apex_m"] / max(r["executed_apex_m"], 1e-6) - 1), 1),
    "planned_mean_gain_m": round(
        s["planned_apex_mean_m"] - r["planned_apex_mean_m"], 3),
}
os.makedirs(os.path.dirname(args.out), exist_ok=True)
with open(args.out, "w") as f:
    json.dump(rows, f, indent=2)
print(json.dumps(rows["summary"]))
print(f"wrote {args.out}")
