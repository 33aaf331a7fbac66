"""Sweep MPC solve throughput vs scenario batch size on the current device.

Usage: python scripts/sweep_batch.py [batch ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from quadruped_springs_tpu.env import randomizers as rnd
from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem

H = 50
ITERS = 10


def main():
    batches = [int(a) for a in sys.argv[1:]] or [256, 1024, 4096]
    prob = MPCProblem(MPCConfig(
        task="JUMPING_IN_PLACE", enable_springs=True,
        horizon=H, iterations=ITERS, n_alphas=8))
    x0 = prob.default_x0()
    u0 = prob.task_warm_start()
    solve = jax.jit(lambda x, u, s: jax.vmap(prob.solve)(x, u, s).cost)

    for B in batches:
        keys = jax.random.split(jax.random.PRNGKey(0), B)
        scen = jax.vmap(
            lambda k: rnd.sample_scenario(prob.cfg, "TEST_RANDOMIZER", k))(keys)
        x0s = jnp.broadcast_to(x0, (B,) + x0.shape)
        u0s = jnp.broadcast_to(u0, (B,) + u0.shape)
        c = solve(x0s, u0s, scen)
        jax.block_until_ready(c)
        n = 2
        t0 = time.perf_counter()
        for _ in range(n):
            c = solve(x0s, u0s, scen)
            jax.block_until_ready(c)
        dt = (time.perf_counter() - t0) / n
        print(f"batch {B:6d}: {dt:8.2f} s/solve-batch  "
              f"{B/dt:10.2f} solves/s  mean_cost {float(jnp.mean(c)):.3f}",
              flush=True)


if __name__ == "__main__":
    main()
