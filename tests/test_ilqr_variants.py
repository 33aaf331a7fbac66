"""Perf-variant correctness for iLQR: lagged relinearization and scan
unrolling must preserve solution quality (they change schedule/accuracy of
the Gauss-Newton model, not the accept/reject logic)."""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.solver import ilqr


def _toy_problem():
    # nonlinear pendulum swing-ish system, n=3, m=1
    dt = 0.05

    def dynamics(x, u):
        th, w, e = x[0], x[1], x[2]
        a = 3.0 * jnp.sin(th) + 2.0 * u[0]
        return jnp.stack([th + dt * w, w + dt * a, e + dt * u[0] ** 2])

    def stage(x, u, t):
        return 0.05 * jnp.sum(u**2) + 0.1 * (x[0] - jnp.pi) ** 2

    def term(x):
        return 10.0 * (x[0] - jnp.pi) ** 2 + 1.0 * x[1] ** 2

    x0 = jnp.zeros(3)
    u0 = jnp.zeros((40, 1))
    return dynamics, stage, term, x0, u0


def test_relin_and_unroll_match_exact():
    dyn, stage, term, x0, u0 = _toy_problem()
    base = ilqr.solve(dyn, stage, term, x0, u0,
                      ilqr.ILQRConfig(horizon=40, iterations=25))
    for cfg in (ilqr.ILQRConfig(horizon=40, iterations=25, relin_every=2),
                ilqr.ILQRConfig(horizon=40, iterations=25, unroll=8),
                ilqr.ILQRConfig(horizon=40, iterations=25, relin_every=2,
                                unroll=8)):
        sol = ilqr.solve(dyn, stage, term, x0, u0, cfg)
        assert np.isfinite(float(sol.cost))
        # quality within 5% of the exact-relinearization solve
        assert float(sol.cost) <= 1.05 * float(base.cost) + 1e-3, (
            cfg, float(sol.cost), float(base.cost))
        # and the cost monotonically non-increasing per iteration
        tr = np.asarray(sol.cost_trace)
        assert np.all(np.diff(tr) <= 1e-5)


def test_unroll_bitwise_same_gains_path():
    """unroll only reschedules the scan — identical math, near-identical
    numerics."""
    dyn, stage, term, x0, u0 = _toy_problem()
    a = ilqr.solve(dyn, stage, term, x0, u0,
                   ilqr.ILQRConfig(horizon=40, iterations=10))
    b = ilqr.solve(dyn, stage, term, x0, u0,
                   ilqr.ILQRConfig(horizon=40, iterations=10, unroll=8))
    np.testing.assert_allclose(np.asarray(a.us), np.asarray(b.us),
                               atol=1e-4)


def test_solve_batched_matches_vmap_solve():
    """The batch-explicit driver must produce the same solutions as
    vmap(solve) (same algorithm, lane-friendly linearization layout)."""
    import jax
    dyn, stage, term, x0, u0 = _toy_problem()
    cfg = ilqr.ILQRConfig(horizon=40, iterations=15)
    B = 3
    key = jax.random.PRNGKey(0)
    x0s = x0 + 0.1 * jax.random.normal(key, (B, 3))
    u0s = jnp.zeros((B, 40, 1))
    ref = jax.vmap(lambda x, u: ilqr.solve(dyn, stage, term, x, u, cfg))(
        x0s, u0s)
    dyn_b = jax.vmap(dyn)
    got = ilqr.solve_batched(dyn_b, stage, term, x0s, u0s, cfg)
    np.testing.assert_allclose(np.asarray(got.cost), np.asarray(ref.cost),
                               rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.us), np.asarray(ref.us),
                               atol=5e-3)
