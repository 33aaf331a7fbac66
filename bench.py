"""Headline benchmark: batched iLQR MPC solves/s on the current chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The north-star target (BASELINE.json) is ≥10,000 MPC solves/s at horizon
H=50 on a v5p-16 (16 chips) — i.e. 625 solves/s/chip. vs_baseline is
measured solves/s/chip divided by that per-chip target.

The reference itself publishes no benchmark numbers (BASELINE.md); its
simulation runs single-env PyBullet on CPU.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from quadruped_springs_tpu.env import randomizers as rnd
from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem

HORIZON = 50
ITERATIONS = 10
BATCH = 256
PER_CHIP_TARGET = 10000.0 / 16.0  # north-star divided across a v5p-16


def main():
    prob = MPCProblem(MPCConfig(
        task="JUMPING_IN_PLACE", enable_springs=True,
        horizon=HORIZON, iterations=ITERATIONS, n_alphas=8))

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, BATCH)
    scenarios = jax.vmap(
        lambda k: rnd.sample_scenario(prob.cfg, "TEST_RANDOMIZER", k))(keys)
    x0 = prob.default_x0()
    u0 = prob.task_warm_start()
    x0s = jnp.broadcast_to(x0, (BATCH,) + x0.shape)
    u0s = jnp.broadcast_to(u0, (BATCH,) + u0.shape)

    solve = jax.jit(lambda x, u, s: jax.vmap(prob.solve)(x, u, s))
    # warmup / compile
    sol = solve(x0s, u0s, scenarios)
    jax.block_until_ready(sol.cost)

    n_runs = 3
    t0 = time.perf_counter()
    for _ in range(n_runs):
        sol = solve(x0s, u0s, scenarios)
        jax.block_until_ready(sol.cost)
    dt = (time.perf_counter() - t0) / n_runs

    solves_per_s = BATCH / dt
    print(json.dumps({
        "metric": f"MPC solves/s/chip (iLQR H={HORIZON}, {ITERATIONS} iters, "
                  f"batch {BATCH}, domain-randomized)",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / PER_CHIP_TARGET, 4),
    }))


if __name__ == "__main__":
    main()
