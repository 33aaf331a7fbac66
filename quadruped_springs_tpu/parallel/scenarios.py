"""Scenario-parallel batched solves over a device mesh.

The TPU-native replacement for the reference's VecEnv axis: thousands of
domain-randomized scenarios (the 4096-backflip config of BASELINE.json)
are sharded across the ('dcn','ici') mesh with `shard_map`; per-shard work
is an ordinary vmapped iLQR solve; global reductions (best/mean cost,
divergence masks) ride ICI collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from quadruped_springs_tpu.env import randomizers as rnd
from quadruped_springs_tpu.parallel.mesh import SCENARIO_AXES, scenario_mesh


def sample_scenario_batch(cfg, mode: str, key: jax.Array, n: int,
                          curriculum_level=0.0) -> rnd.ScenarioParams:
    keys = jax.random.split(key, n)
    return jax.vmap(
        lambda k: rnd.sample_scenario(cfg, mode, k, curriculum_level))(keys)


def sharded_solve(problem, x0s, u_inits, scenarios, mesh=None):
    """Solve a batch of MPC problems sharded over the mesh.

    Args:
      problem: solver.mpc.MPCProblem.
      x0s: (N, 37); u_inits: (N, H, m); scenarios: ScenarioParams with
        leading dim N. N must divide the mesh size.
    Returns:
      (us (N,H,m), costs (N,), diverged (N,) bool) — divergence detection
      masks NaN/exploding scenarios instead of killing the batch
      (SURVEY §5 failure-detection obligation).
    """
    mesh = scenario_mesh() if mesh is None else mesh
    spec = P(SCENARIO_AXES)

    def shard_fn(x0, u0, scen):
        sol = jax.vmap(problem.solve)(x0, u0, scen)
        diverged = ~(jnp.isfinite(sol.cost)
                     & jnp.all(jnp.isfinite(sol.us), axis=(1, 2)))
        return sol.us, sol.cost, diverged

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, spec, spec),
        check_vma=False,
    )
    return fn(x0s, u_inits, scenarios)


def global_stats(costs, diverged, mesh=None):
    """Mean/min cost + divergence count across the full batch (a psum-style
    global; jnp reductions over sharded arrays lower to ICI collectives)."""
    ok = ~diverged
    n_ok = jnp.maximum(jnp.sum(ok), 1)
    mean_cost = jnp.sum(jnp.where(ok, costs, 0.0)) / n_ok
    best_cost = jnp.min(jnp.where(ok, costs, jnp.inf))
    return {"mean_cost": mean_cost, "best_cost": best_cost,
            "n_diverged": jnp.sum(diverged)}
