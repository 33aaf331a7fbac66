"""Solve a jump-in-place trajectory-optimization problem with the iLQR MPC.

The flagship compute path: batched iLQR over the analytic Go1 dynamics
(BASELINE.json north star). Prints cost trace and apex height of the
optimized trajectory.

Usage: python examples/run_mpc.py [--cpu] [--batch N] [--mppi]

--mppi solves the same problem with the sampling-based MPPI solver
(solver/mppi.py) instead of iLQR.
"""

import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem


def main():
    batch = 0
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])

    prob = MPCProblem(MPCConfig(
        task="JUMPING_IN_PLACE",
        enable_springs=True,
        horizon=25,
        iterations=6,
        n_alphas=6,
        backward="parallel" if "--parallel-riccati" in sys.argv
        else "sequential",
    ))
    x0 = prob.default_x0()
    u0 = prob.default_warm_start()

    if "--mppi" in sys.argv:
        from quadruped_springs_tpu.solver.mppi import MPPIConfig
        sol = prob.solve_mppi(
            x0, prob.task_warm_start(), jax.random.PRNGKey(0),
            MPPIConfig(horizon=25, iterations=8, n_samples=32))
    else:
        sol = prob.solve(x0, u0)
    print("cost trace:", [f"{c:.2f}" for c in sol.cost_trace])
    zs = sol.xs[:, 2]
    vz = sol.xs[:, 9]
    apex = jnp.max(zs + jnp.maximum(vz, 0) ** 2 / (2 * 9.81))
    print(f"initial cost -> final cost: {float(sol.cost_trace[0]):.2f} -> "
          f"{float(sol.cost):.2f}")
    print(f"max height along plan: {float(jnp.max(zs)):.3f} m; "
          f"predicted apex: {float(apex):.3f} m")
    print(f"controls finite: {bool(jnp.all(jnp.isfinite(sol.us)))}; "
          f"|u|max={float(jnp.abs(sol.us).max()):.2f}")

    if batch:
        x0s = jnp.broadcast_to(x0, (batch,) + x0.shape)
        u0s = jnp.broadcast_to(u0, (batch,) + u0.shape)
        sols = prob.solve_batch(x0s, u0s)
        print(f"batched solve x{batch}: costs "
              f"min={float(sols.cost.min()):.2f} max={float(sols.cost.max()):.2f}")


if __name__ == "__main__":
    main()
