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

rows = {}
for springs in (True, False):
    label = "springs" if springs else "rigid"
    t0 = time.time()
    prob = MPCProblem(MPCConfig(task="JUMPING_IN_PLACE", horizon=50,
                                iterations=10, n_alphas=8,
                                enable_springs=springs))
    env = V.fidelity_env("JUMPING_IN_PLACE", enable_springs=springs)
    state, _ = env.reset(jax.random.PRNGKey(0))
    sol = prob.solve_mppi(state_to_vec(state.robot),
                          prob.task_warm_start(), jax.random.PRNGKey(1),
                          mppi.MPPIConfig(horizon=50, iterations=10))
    planned_apex = float(jnp.max(sol.xs[:, 2]))
    trace = np.asarray(V.record_golden_trace(env, sol.us, jax.random.PRNGKey(2)))
    got = V.split_trace(trace, env.action_dim)
    z = got["pos"][:, 2]
    tau = got["tau"]
    # peak |tau| and total positive mechanical work by the MOTORS
    # (spring work is free — that's the point)
    qd = got["qd"]
    motor_power = np.maximum(np.sum(tau * qd, axis=1), 0.0)
    rows[label] = {
        "planned_apex_m": round(planned_apex, 3),
        "executed_apex_m": round(float(z.max()), 3),
        "final_cost": round(float(sol.cost), 2),
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
}
os.makedirs(os.path.dirname(args.out), exist_ok=True)
with open(args.out, "w") as f:
    json.dump(rows, f, indent=2)
print(json.dumps(rows["summary"]))
print(f"wrote {args.out}")
