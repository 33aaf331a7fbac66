"""MPPI hyperparameter data points on the chip — quality at fixed compute.

Same problem batch as bench.py (JIP, H=50, 10 iterations, K=32, batch
1024, domain-randomized); each candidate varies the sampling
distribution/weighting statics. Prints one JSON line per candidate with
throughput AND mean final cost. The bench default stays untouched unless
a candidate wins BOTH axes.

Usage: python scripts/mppi_tune.py [--cpu] [--names a b ...]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--batch", type=int, default=1024)
ap.add_argument("--names", nargs="*", default=None)
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from quadruped_springs_tpu.env import randomizers as rnd  # noqa: E402
from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem  # noqa: E402
from quadruped_springs_tpu.solver.mppi import MPPIConfig  # noqa: E402

CANDS = {
    "default": {},
    "sharp": {"temperature": 0.02, "elite_frac": 0.25},
    "wide": {"sigma": 0.4, "sigma_decay": 0.9},
    "k64": {"n_samples": 64},
}

prob = MPCProblem(MPCConfig(task="JUMPING_IN_PLACE", enable_springs=True,
                            horizon=50, iterations=10, n_alphas=8))
B = args.batch
keys = jax.random.split(jax.random.PRNGKey(0), B)
scenarios = jax.vmap(
    lambda k: rnd.sample_scenario(prob.cfg, "TEST_RANDOMIZER", k))(keys)
x0 = prob.default_x0()
u0 = prob.task_warm_start()
x0s = jnp.broadcast_to(x0, (B,) + x0.shape)
u0s = jnp.broadcast_to(u0, (B,) + u0.shape)
mppi_keys = jax.random.split(jax.random.PRNGKey(1), B)

for name in (args.names or list(CANDS)):
    kw = dict(n_samples=32, horizon=50, iterations=10)
    kw.update(CANDS[name])
    mcfg = MPPIConfig(**kw)
    solve = jax.jit(lambda x, u, k, s: jax.vmap(
        lambda xi, ui, ki, si: prob.solve_mppi(xi, ui, ki, mcfg, si).cost
    )(x, u, k, s))
    t0 = time.perf_counter()
    costs = jax.block_until_ready(solve(x0s, u0s, mppi_keys, scenarios))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        jax.block_until_ready(solve(x0s, u0s, mppi_keys, scenarios))
    dt = (time.perf_counter() - t0) / 3
    print(json.dumps({
        "name": name, "solves_per_s": round(B / dt, 1),
        "mean_cost": round(float(jnp.mean(costs)), 2),
        "compile_s": round(compile_s, 1)}), flush=True)
