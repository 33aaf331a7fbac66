"""iLQR solver unit tests on analytically tractable problems + the Go1 MPC
smoke path."""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.solver import ilqr
from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem


def test_lqr_double_integrator():
    """On an LQR problem iLQR must match the Riccati-optimal cost after one
    iteration (dynamics linear, cost quadratic -> exact Newton step)."""
    dt = 0.1
    A = jnp.array([[1.0, dt], [0.0, 1.0]])
    B = jnp.array([[0.0], [dt]])
    Q = jnp.diag(jnp.array([1.0, 0.1]))
    Rm = jnp.array([[0.1]])

    dynamics = lambda x, u: A @ x + B @ u
    stage = lambda x, u, t: 0.5 * (x @ Q @ x + u @ Rm @ u)
    terminal = lambda x: 0.5 * x @ Q @ x

    x0 = jnp.array([1.0, 0.0])
    H = 30
    cfg = ilqr.ILQRConfig(horizon=H, iterations=3, n_alphas=4,
                          reg_init=1e-6, u_min=-10.0, u_max=10.0)
    sol = ilqr.solve(dynamics, stage, terminal, x0, jnp.zeros((H, 1)), cfg)

    # discrete Riccati reference
    P = np.asarray(Q)
    An, Bn, Qn, Rn = map(np.asarray, (A, B, Q, Rm))
    for _ in range(H):
        K = np.linalg.solve(Rn + Bn.T @ P @ Bn, Bn.T @ P @ An)
        P = Qn + An.T @ P @ (An - Bn @ K)
    cost_opt = 0.5 * np.asarray(x0) @ P @ np.asarray(x0)
    assert float(sol.cost) <= cost_opt * 1.02 + 1e-6
    # monotone trace
    trace = np.asarray(sol.cost_trace)
    assert np.all(np.diff(trace) <= 1e-6)


def test_ilqr_respects_control_bounds():
    dynamics = lambda x, u: x + 0.1 * u
    stage = lambda x, u, t: 0.0 * jnp.sum(u**2)
    terminal = lambda x: jnp.sum((x - 100.0) ** 2)  # wants huge controls
    cfg = ilqr.ILQRConfig(horizon=5, iterations=5, n_alphas=4)
    sol = ilqr.solve(dynamics, stage, terminal, jnp.zeros(1),
                     jnp.zeros((5, 1)), cfg)
    assert float(jnp.abs(sol.us).max()) <= 1.0 + 1e-6


def test_mpc_jump_in_place_improves_apex():
    """Go1 jump-in-place MPC from the task warm start must produce a plan
    whose apex clears standing height, with finite controls."""
    prob = MPCProblem(MPCConfig(task="JUMPING_IN_PLACE", horizon=20,
                                iterations=5, n_alphas=4))
    sol = prob.solve(prob.default_x0(), prob.task_warm_start())
    zs = sol.xs[:, 2]
    vz = sol.xs[:, 9]
    apex = float(jnp.max(zs + jnp.maximum(vz, 0.0) ** 2 / (2 * 9.81)))
    assert apex > 0.40, f"apex {apex}"
    assert bool(jnp.all(jnp.isfinite(sol.us)))
    # cost trace never increases (line-search acceptance)
    trace = np.asarray(sol.cost_trace)
    assert np.all(np.diff(trace) <= 1e-5)


def test_mpc_receding_horizon_step():
    prob = MPCProblem(MPCConfig(task="CONTINUOUS_JUMPING_FORWARD_PPO",
                                horizon=8, iterations=2, n_alphas=2))
    x0 = prob.default_x0()
    u = prob.default_warm_start()
    x1, u0, u_next, cost = prob.mpc_step(x0, u)
    assert x1.shape == x0.shape
    assert u_next.shape == u.shape
    assert bool(jnp.isfinite(cost))
