"""Headline benchmark: batched MPC solves/s on the current chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The north-star target (BASELINE.json) is ≥10,000 MPC solves/s at horizon
H=50 on a v5p-16 (16 chips) — i.e. 625 solves/s/chip. vs_baseline is
measured solves/s/chip divided by that per-chip target.

The headline solver is MPPI (solver/mppi.py): on the identical problem
batch it reaches both a HIGHER throughput and a BETTER mean final cost
than the iLQR solver, because sampling needs no 43-tangent linearization
and no sequential Riccati sweep — rollouts are pure lane-parallel scans.

HONEST-REPORTING NOTE: the metric string discloses the planner model via
MPCConfig.planner_desc. The default benchmark plans on the relaxed
200 Hz / 4 kN/m planner model that both solvers share (standard MPC
practice: soft planner, stiff executor — solver/mpc.py MPCConfig);
`--full-rate` benches planning on the execution-rate model instead
(10x1 ms substeps, the executor's 180 kN/m / 100 contact with clamp on —
MPCConfig.full_rate(); the planner remains memoryless, i.e. no
anchor-spring stiction, as disclosed there). Transfer from the relaxed
planner to the stiff executor is gated mechanically in
tests/test_transfer.py.
Flags: --ilqr (gradient solver), --full-rate, --cpu.

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
from quadruped_springs_tpu.solver.mppi import MPPIConfig

HORIZON = 50
ITERATIONS = 10
BATCH = 1024
N_SAMPLES = 32
PER_CHIP_TARGET = 10000.0 / 16.0  # north-star divided across a v5p-16


def main():
    global BATCH
    if "--batch" in sys.argv:
        BATCH = int(sys.argv[sys.argv.index("--batch") + 1])
    use_ilqr = "--ilqr" in sys.argv
    full_rate = "--full-rate" in sys.argv
    exact = "--exact" in sys.argv   # classic f32 full-relinearization iLQR
    springs = "--no-springs" not in sys.argv  # rigid-baseline bench row
    mk = MPCConfig.full_rate if full_rate else MPCConfig
    perf = {} if (not use_ilqr or exact) else dict(
        # measured TPU frontier (scripts/ilqr_sweep.py): bf16 A/B sweep is
        # quality-neutral (-59.98 vs -59.23 exact); relinearizing every
        # 3rd iteration costs 3.4% final cost for 2.5x total speed.
        lin_dtype="bf16", relin_every=3)
    cfg = mk(task="JUMPING_IN_PLACE", enable_springs=springs,
             horizon=HORIZON, iterations=ITERATIONS, n_alphas=8, **perf)
    prob = MPCProblem(cfg)

    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, BATCH)
    scenarios = jax.vmap(
        lambda k: rnd.sample_scenario(prob.cfg, "TEST_RANDOMIZER", k))(keys)
    x0 = prob.default_x0()
    u0 = prob.task_warm_start()
    x0s = jnp.broadcast_to(x0, (BATCH,) + x0.shape)
    u0s = jnp.broadcast_to(u0, (BATCH,) + u0.shape)

    if use_ilqr:
        if exact:
            solve = jax.jit(lambda x, u, s: jax.vmap(prob.solve)(x, u, s))
            run = lambda: solve(x0s, u0s, scenarios).cost
            desc = f"iLQR H={HORIZON}, {ITERATIONS} iters, exact-f32"
        else:
            run = lambda: prob.solve_batch(x0s, u0s, scenarios).cost
            desc = (f"iLQR H={HORIZON}, {ITERATIONS} iters, bf16-lin, "
                    f"relin/{cfg.relin_every}")
    else:
        mcfg = MPPIConfig(horizon=HORIZON, iterations=ITERATIONS,
                          n_samples=N_SAMPLES,
                          sample_dtype="bf16" if "--bf16" in sys.argv
                          else "f32")
        mppi_keys = jax.random.split(jax.random.PRNGKey(1), BATCH)
        solve = jax.jit(lambda x, u, k, s: jax.vmap(
            lambda xi, ui, ki, si: prob.solve_mppi(xi, ui, ki, mcfg, si).cost
        )(x, u, k, s))
        run = lambda: solve(x0s, u0s, mppi_keys, scenarios)
        desc = (f"MPPI H={HORIZON}, {ITERATIONS} iters, K={N_SAMPLES}"
                + (", bf16-samples" if mcfg.sample_dtype == "bf16" else ""))

    # warmup / compile
    costs = jax.block_until_ready(run())

    n_runs = 3
    t0 = time.perf_counter()
    for _ in range(n_runs):
        jax.block_until_ready(run())
    dt = (time.perf_counter() - t0) / n_runs

    solves_per_s = BATCH / dt
    print(json.dumps({
        "metric": f"MPC solves/s/chip ({desc}, {cfg.planner_desc}, "
                  f"batch {BATCH}, domain-randomized"
                  + ("" if springs else ", no-springs") + ")",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / PER_CHIP_TARGET, 4),
        "mean_final_cost": round(float(jnp.mean(costs)), 2),
    }))


if __name__ == "__main__":
    main()
