"""Worker for the 2-process jax.distributed CPU test (the DCN code path).

Usage: python scripts/dcn_worker.py PORT PROCESS_ID NUM_PROCESSES

Each process contributes 2 virtual CPU devices; the ('dcn','ici') mesh
becomes (num_processes, 2) and a cross-process reduction exercises the
multi-host collective path of parallel/mesh.py (init_distributed +
scenario_mesh) that a real v5p multi-host slice would use over DCN.
Prints DCN_OK on success.
"""

import os
import sys


def main():
    port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax
    jax.config.update("jax_platforms", "cpu")

    from functools import partial

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from quadruped_springs_tpu.parallel import mesh as pmesh

    pmesh.init_distributed(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    mesh = pmesh.scenario_mesh()
    assert mesh.devices.shape == (nproc, 2), mesh.devices.shape

    sharding = pmesh.scenario_sharding(mesh)
    n = 4 * nproc

    @partial(jax.jit, out_shardings=sharding)
    def make_data():
        return jnp.arange(n, dtype=jnp.float32)

    x = make_data()
    # cross-process global reduction: lowers to a collective over the
    # 'dcn' (process) axis — the DCN path on a real multi-host slice
    total = jax.jit(lambda a: jnp.sum(a * 2.0))(x)
    expect = float(n * (n - 1))
    assert abs(float(total) - expect) < 1e-5, (float(total), expect)

    # one sharded scenario-batched MPC solve across both processes
    from quadruped_springs_tpu.env import randomizers as rnd
    from quadruped_springs_tpu.parallel.scenarios import (
        global_stats, sharded_solve)
    from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem

    prob = MPCProblem(MPCConfig(task="JUMPING_IN_PLACE", enable_springs=True,
                                horizon=3, iterations=1, n_alphas=2))
    x0 = prob.default_x0()
    u0 = prob.default_warm_start()
    rep = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=(sharding, sharding))
    def make_inputs():
        return (jnp.broadcast_to(x0, (n,) + x0.shape),
                jnp.broadcast_to(u0, (n,) + u0.shape))

    x0s, u0s = make_inputs()

    @partial(jax.jit,
             out_shardings=jax.tree.map(lambda _: sharding,
                                        rnd.nominal_params(prob.cfg)))
    def make_scens():
        keys = jax.random.split(jax.random.PRNGKey(0), n)
        return jax.vmap(lambda k: rnd.sample_scenario(
            prob.cfg, "TEST_RANDOMIZER", k))(keys)

    scenarios = make_scens()
    us, costs, diverged = sharded_solve(prob, x0s, u0s, scenarios, mesh=mesh)
    stats = jax.jit(global_stats)(costs, diverged)
    assert bool(jnp.isfinite(stats["mean_cost"]))
    assert int(stats["n_diverged"]) == 0
    print(f"DCN_OK p{pid}: mesh {mesh.devices.shape}, "
          f"mean_cost {float(stats['mean_cost']):.3f}", flush=True)


if __name__ == "__main__":
    main()
