"""iLQR throughput sweep on the current chip — one bundled run so every
variant's ~25 min TPU compile happens in a single session (compile cache
makes reruns cheap). Measures solves/s at the bench shape (H=50, 10 iters,
batch from --batch) for: baseline, n_alphas=4, relin_every=2,
unroll=8, and combinations; prints one JSON line per variant with
throughput AND mean final cost (a speedup that degrades cost is not a
win).

Usage: python scripts/ilqr_sweep.py [--cpu] [--batch 1024] [--variants a b ...]
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
ap.add_argument("--variants", nargs="*", default=None)
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from quadruped_springs_tpu.env import randomizers as rnd  # noqa: E402
from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem  # noqa: E402

VARIANTS = {
    "baseline": {},
    "alpha4": {"n_alphas": 4},
    "relin2": {"relin_every": 2},
    "relin3": {"relin_every": 3},
    "unroll8": {"ilqr_unroll": 8},
    "alpha4_relin2": {"n_alphas": 4, "relin_every": 2},
    "alpha4_relin2_unroll8": {"n_alphas": 4, "relin_every": 2,
                              "ilqr_unroll": 8},
    "linbf16": {"lin_dtype": "bf16"},
    "linbf16_relin2": {"lin_dtype": "bf16", "relin_every": 2},
    # batch-explicit driver (ilqr.solve_batched): lane-friendly
    # linearization layout — batch minor instead of the 43 tangents
    "batched": {"_batched": True},
    "batched_relin2": {"_batched": True, "relin_every": 2},
    "batched_bf16": {"_batched": True, "lin_dtype": "bf16"},
    "batched_bf16_relin2": {"_batched": True, "lin_dtype": "bf16",
                            "relin_every": 2},
    "batched_bf16_relin3": {"_batched": True, "lin_dtype": "bf16",
                            "relin_every": 3},
    "batched_bf16_relin2_alpha6": {"_batched": True, "lin_dtype": "bf16",
                                   "relin_every": 2, "n_alphas": 6},
}

HORIZON, ITERS, TARGET = 50, 10, 625.0


def bench_variant(name, kw, batch):
    batched = kw.pop("_batched", False)
    prob = MPCProblem(MPCConfig(
        task="JUMPING_IN_PLACE", enable_springs=True,
        horizon=HORIZON, iterations=ITERS, n_alphas=kw.pop("n_alphas", 8),
        **kw))
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    scenarios = jax.vmap(
        lambda k: rnd.sample_scenario(prob.cfg, "TEST_RANDOMIZER", k))(keys)
    x0 = prob.default_x0()
    u0 = prob.task_warm_start()
    x0s = jnp.broadcast_to(x0, (batch,) + x0.shape)
    u0s = jnp.broadcast_to(u0, (batch,) + u0.shape)
    if batched:
        solve = lambda x, u, s: prob.solve_batch(x, u, s)
    else:
        solve = jax.jit(lambda x, u, s: jax.vmap(prob.solve)(x, u, s))
    t0 = time.perf_counter()
    out = solve(x0s, u0s, scenarios)
    jax.block_until_ready(out.cost)
    compile_s = time.perf_counter() - t0
    n_runs = 3
    t0 = time.perf_counter()
    for _ in range(n_runs):
        jax.block_until_ready(solve(x0s, u0s, scenarios).cost)
    dt = (time.perf_counter() - t0) / n_runs
    sps = batch / dt
    print(json.dumps({
        "variant": name, "solves_per_s": round(sps, 1),
        "vs_target": round(sps / TARGET, 3),
        "mean_cost": round(float(jnp.mean(out.cost)), 2),
        "compile_s": round(compile_s, 1), "batch": batch}), flush=True)


names = args.variants or list(VARIANTS)
for nm in names:
    bench_variant(nm, dict(VARIANTS[nm]), args.batch)
