"""Measure planner->executor transfer: solve on the relaxed planner model,
execute the plan open-loop on the stiff 1 kHz env, compare apex/behavior.

Calibration run for tests/test_transfer.py tolerances.
Usage: python scripts/measure_transfer.py [--solver mppi|ilqr|both]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem
from quadruped_springs_tpu.solver import mppi
from quadruped_springs_tpu.utils import verification as V


def run_one(solver: str):
    prob = MPCProblem(MPCConfig(task="JUMPING_IN_PLACE", horizon=50,
                                iterations=10, n_alphas=8))
    env = V.fidelity_env("JUMPING_IN_PLACE")
    # plan from the env's settled state so execution starts where the plan does
    state, _ = env.reset(jax.random.PRNGKey(0))
    from quadruped_springs_tpu.solver.mpc import state_to_vec
    x0 = state_to_vec(state.robot)
    u0 = prob.task_warm_start()
    if solver == "mppi":
        sol = prob.solve_mppi(x0, u0, jax.random.PRNGKey(1),
                              mppi.MPPIConfig(horizon=50, iterations=10))
    else:
        sol = prob.solve(x0, u0)
    planned_apex = float(jnp.max(sol.xs[:, 2]))
    planned_cost = float(sol.cost)

    # execute open-loop on the stiff 1 kHz env (anchor stiction, 180 kN/m)
    rows = np.asarray(V.record_golden_trace(env, sol.us, jax.random.PRNGKey(2)))
    got = V.split_trace(rows, env.action_dim)
    z = got["pos"][:, 2]
    executed_apex = float(z.max())
    final_z = float(z[-1])
    upright = bool(final_z > 0.15 and
                   abs(got["quat"][-1, 0]) + abs(got["quat"][-1, 1]) < 0.5)
    return {
        "solver": solver,
        "planned_apex_m": round(planned_apex, 4),
        "executed_apex_m": round(executed_apex, 4),
        "apex_gap_m": round(abs(planned_apex - executed_apex), 4),
        "planned_cost": round(planned_cost, 2),
        "final_z_m": round(final_z, 4),
        "ends_upright": upright,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--solver", default="both")
    args = ap.parse_args()
    solvers = ["mppi", "ilqr"] if args.solver == "both" else [args.solver]
    for s in solvers:
        print(json.dumps(run_one(s)), flush=True)


if __name__ == "__main__":
    main()
