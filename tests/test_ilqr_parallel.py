"""Parallel-in-time (associative-scan) Riccati backward vs sequential."""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.solver import ilqr
from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem


def _lqr_problem():
    dt = 0.1
    A = jnp.array([[1.0, dt], [0.0, 1.0]])
    B = jnp.array([[0.0], [dt]])
    Q = jnp.diag(jnp.array([1.0, 0.1]))
    Rm = jnp.array([[0.1]])
    dynamics = lambda x, u: A @ x + B @ u
    stage = lambda x, u, t: 0.5 * (x @ Q @ x + u @ Rm @ u) + 0.3 * u.sum() * x[0]
    terminal = lambda x: 0.5 * x @ Q @ x + 0.2 * x[1]
    return dynamics, stage, terminal


def test_parallel_backward_matches_sequential_on_lqr():
    """On an LQ problem (with cross terms and linear terms) both sweeps are
    exact Newton steps, so one iteration from the same reg must agree."""
    dynamics, stage, terminal = _lqr_problem()
    x0 = jnp.array([1.0, -0.5])
    H = 16
    u0 = jnp.zeros((H, 1))
    common = dict(horizon=H, iterations=4, n_alphas=4,
                  reg_init=1e-6, u_min=-10.0, u_max=10.0)
    sol_seq = ilqr.solve(dynamics, stage, terminal, x0, u0,
                         ilqr.ILQRConfig(**common, backward="sequential"))
    sol_par = ilqr.solve(dynamics, stage, terminal, x0, u0,
                         ilqr.ILQRConfig(**common, backward="parallel"))
    assert jnp.allclose(sol_seq.cost, sol_par.cost, rtol=1e-4), (
        float(sol_seq.cost), float(sol_par.cost))
    assert jnp.allclose(sol_seq.us, sol_par.us, atol=2e-3), (
        float(jnp.max(jnp.abs(sol_seq.us - sol_par.us))))


def test_parallel_backward_go1_jump():
    """The full Go1 MPC converges with the parallel sweep too."""
    prob = MPCProblem(MPCConfig(task="JUMPING_IN_PLACE", horizon=20,
                                iterations=5, n_alphas=4))
    cfg = ilqr.ILQRConfig(horizon=20, iterations=5, n_alphas=4,
                          backward="parallel")
    dyn_fn = lambda x, u: prob.dynamics(x, u, None)
    sol = ilqr.solve(dyn_fn, prob.stage_cost, prob.terminal_cost,
                     prob.default_x0(), prob.task_warm_start(), cfg)
    trace = np.asarray(sol.cost_trace)
    assert np.all(np.diff(trace) <= 1e-5)
    assert bool(jnp.all(jnp.isfinite(sol.us)))
    zs = sol.xs[:, 2]
    vz = sol.xs[:, 9]
    apex = float(jnp.max(zs + jnp.maximum(vz, 0.0) ** 2 / (2 * 9.81)))
    assert apex > 0.40, apex
