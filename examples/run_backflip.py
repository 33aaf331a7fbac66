"""Plan a backflip with the iLQR MPC — the hardest task in the suite.

The BACKFLIP cost (tasks/costs.py, from robot_tasks.py:518-550) rewards
accumulated pitch rotation and height; the solver discovers the crouch →
explosive rear-leg extension → tuck rotation sequence from the generic
crouch-extend warm start. At H=60 (0.6 s) the planner reaches ~330 deg of
rotation (a full flip incl. landing needs the receding-horizon loop —
solver/mpc.py mpc_step).

Usage: python examples/run_backflip.py [--cpu] [--horizon H] [--iters N]
"""

import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.models import spatial as sp
from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem


def main():
    H = 60
    if "--horizon" in sys.argv:
        H = int(sys.argv[sys.argv.index("--horizon") + 1])
    iters = 14
    if "--iters" in sys.argv:
        iters = int(sys.argv[sys.argv.index("--iters") + 1])

    prob = MPCProblem(MPCConfig(task="BACKFLIP", horizon=H,
                                iterations=iters, n_alphas=8))
    sol = prob.solve(prob.default_x0(), prob.task_warm_start())

    xs = np.asarray(sol.xs)
    pitch = np.array([
        float(sp.pitch_unwrapped_yxz(jnp.asarray(q), jnp.asarray(False)))
        for q in xs[:, 3:7]])
    rotation = np.unwrap(pitch)
    total = rotation.max() - rotation.min()
    trace = np.asarray(sol.cost_trace)
    print(f"BACKFLIP H={H}, {iters} iterations:")
    print(f"  cost {trace[0]:.1f} -> {trace[-1]:.1f} "
          f"(monotone={bool(np.all(np.diff(trace) <= 1e-5))})")
    print(f"  rotation achieved: {total:.2f} rad = {np.degrees(total):.0f} deg")
    print(f"  apex height: {xs[:, 2].max():.3f} m")
    print(f"  controls finite: {bool(np.isfinite(np.asarray(sol.us)).all())}")


if __name__ == "__main__":
    main()
