"""Round-3 MPPI perf sweep on the real chip: fused-accept, substep unroll,
full-rate (new 180 kN/m execution constants), bf16 sampling — each config
timed at batch 1024 with FLOPs from XLA cost analysis and an MFU estimate.

Each NEW jitted config costs a long remote compile on the axon tunnel;
this script runs them serially and appends one JSON line per config to
--out (default /tmp/mppi_r3_sweep.jsonl) so partial progress survives.

Usage: python scripts/mppi_r3_sweep.py [--configs a,b,...] [--batch 1024]
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

from quadruped_springs_tpu.env import randomizers as rnd
from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem
from quadruped_springs_tpu.solver.mppi import MPPIConfig

# assumed peak for MFU (documented): TPU v5 lite (v5e) = 197 TFLOP/s bf16
# MXU peak; f32 ops lower via the same MXU (we report against bf16 peak —
# conservative). The workload is VPU/elementwise-heavy (37-dim states), so
# low MFU here means latency/VPU-bound, not a wasted MXU.
PEAK_FLOPS = {"TPU v5 lite": 197e12}

H, ITERS, K = 50, 10, 32


def configs():
    return {
        # headline candidates (relaxed planner model)
        "relaxed_base": (MPCConfig, {}, MPPIConfig(
            horizon=H, iterations=ITERS, n_samples=K)),
        "relaxed_fused": (MPCConfig, {}, MPPIConfig(
            horizon=H, iterations=ITERS, n_samples=K, fused_accept=True)),
        # full-rate (execution-model) candidates
        "fullrate_base": (MPCConfig.full_rate, {}, MPPIConfig(
            horizon=H, iterations=ITERS, n_samples=K)),
        "fullrate_fused": (MPCConfig.full_rate, {}, MPPIConfig(
            horizon=H, iterations=ITERS, n_samples=K, fused_accept=True)),
        "fullrate_fused_unroll5": (
            MPCConfig.full_rate, {"substep_unroll": 5}, MPPIConfig(
                horizon=H, iterations=ITERS, n_samples=K, fused_accept=True)),
        "fullrate_fused_bf16": (MPCConfig.full_rate, {}, MPPIConfig(
            horizon=H, iterations=ITERS, n_samples=K, fused_accept=True,
            sample_dtype="bf16")),
        "fullrate_fused_K64_it5": (MPCConfig.full_rate, {}, MPPIConfig(
            horizon=H, iterations=5, n_samples=64, fused_accept=True)),
    }


def run_config(name, mk, mk_kw, mcfg, batch):
    cfg = mk(task="JUMPING_IN_PLACE", enable_springs=True, horizon=H,
             iterations=mcfg.iterations, **mk_kw)
    prob = MPCProblem(cfg)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    scenarios = jax.vmap(
        lambda k: rnd.sample_scenario(prob.cfg, "TEST_RANDOMIZER", k))(keys)
    x0 = prob.default_x0()
    u0 = prob.task_warm_start()
    x0s = jnp.broadcast_to(x0, (batch,) + x0.shape)
    u0s = jnp.broadcast_to(u0, (batch,) + u0.shape)
    mppi_keys = jax.random.split(jax.random.PRNGKey(1), batch)

    fn = jax.jit(lambda x, u, k, s: jax.vmap(
        lambda xi, ui, ki, si: prob.solve_mppi(xi, ui, ki, mcfg, si).cost
    )(x, u, k, s))

    t0 = time.time()
    lowered = fn.lower(x0s, u0s, mppi_keys, scenarios)
    compiled = lowered.compile()
    compile_s = time.time() - t0
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        flops = float(ca.get("flops", 0.0))
    except Exception as e:
        flops = 0.0
        print(f"  cost_analysis failed: {e}", file=sys.stderr)

    costs = jax.block_until_ready(compiled(x0s, u0s, mppi_keys, scenarios))
    n_runs = 3
    t0 = time.perf_counter()
    for _ in range(n_runs):
        costs = jax.block_until_ready(
            compiled(x0s, u0s, mppi_keys, scenarios))
    dt = (time.perf_counter() - t0) / n_runs

    kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind)
    mfu = (flops / dt / peak) if (peak and flops) else None
    return {
        "config": name,
        "planner": cfg.planner_desc,
        "mppi": {"K": mcfg.n_samples, "iters": mcfg.iterations,
                 "fused": mcfg.fused_accept, "dtype": mcfg.sample_dtype,
                 "unroll": cfg.substep_unroll},
        "batch": batch,
        "solves_per_s": round(batch / dt, 2),
        "mean_final_cost": round(float(jnp.mean(costs)), 2),
        "wall_per_batch_s": round(dt, 4),
        "compile_s": round(compile_s, 1),
        "flops_per_batch": flops,
        "mfu": round(mfu, 5) if mfu is not None else None,
        "device_kind": kind,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--out", default="/tmp/mppi_r3_sweep.jsonl")
    args = ap.parse_args()
    all_cfg = configs()
    names = ([c for c in args.configs.split(",") if c]
             if args.configs else list(all_cfg))
    for name in names:
        mk, mk_kw, mcfg = all_cfg[name]
        print(f"=== {name} ===", flush=True)
        try:
            rec = run_config(name, mk, mk_kw, mcfg, args.batch)
        except Exception as e:
            rec = {"config": name, "error": repr(e)}
        print(json.dumps(rec), flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
