"""Device-sharded parallel-in-time Riccati (parallel/riccati.py) must
reproduce the sequential backward sweep's gains on the 8-device CPU mesh
— the time axis split over devices, composed with all_gather + ppermute."""

import numpy as np

import pytest

import jax
import jax.numpy as jnp

# slow tier: each sharded 8-device backward costs 30-40 s of
# trace+compile on this 1-CPU container; the sequence-parallel option it
# gates is exercised nowhere else in the fast loop (docs/TEST_BUDGET.md)
pytestmark = pytest.mark.slow

from quadruped_springs_tpu.parallel.mesh import scenario_mesh
from quadruped_springs_tpu.parallel.riccati import sharded_lqt_backward
from quadruped_springs_tpu.solver import ilqr


def _random_lq(key, H=50, n=7, m=3):
    ks = jax.random.split(key, 8)
    A = 0.9 * jnp.eye(n) + 0.1 * jax.random.normal(ks[0], (H, n, n)) / n
    B = jax.random.normal(ks[1], (H, n, m)) / n
    lx = jax.random.normal(ks[2], (H, n))
    lu = jax.random.normal(ks[3], (H, m))
    W = jax.random.normal(ks[4], (H, n, n)) / n
    lxx = W @ W.swapaxes(-1, -2) + 0.5 * jnp.eye(n)
    # diagonally dominant control Hessian so BOTH reg paths reduce to the
    # same tiny LM shift (the sequential sweep shifts Quu, the LQT
    # elements shift luu — comparable only when neither binds)
    V = jax.random.normal(ks[5], (H, m, m)) / (4 * m)
    luu = V @ V.swapaxes(-1, -2) + 1.0 * jnp.eye(m)
    lux = 0.1 * jax.random.normal(ks[6], (H, m, n))
    VxT = jax.random.normal(ks[7], (n,))
    VxxT = 2.0 * jnp.eye(n)
    return A, B, lx, lu, lxx, luu, lux, VxT, VxxT


def test_sharded_backward_matches_sequential():
    mesh = scenario_mesh()
    assert mesh.shape["ici"] >= 2
    args = _random_lq(jax.random.PRNGKey(0))
    reg = jnp.asarray(1e-5)

    cfg = ilqr.ILQRConfig(horizon=50, reg_mode="control",
                          pd_shift="gershgorin")
    ks_seq, Ks_seq, _, ok = ilqr.riccati_sequential(
        *args[:7], args[7], args[8], reg, cfg)
    assert bool(ok)

    ks_sh, Ks_sh = sharded_lqt_backward(*args, reg, mesh=mesh)
    # identical LQ subproblem; both PD-shift by the same Gershgorin rule.
    np.testing.assert_allclose(np.asarray(ks_sh), np.asarray(ks_seq),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(Ks_sh), np.asarray(Ks_seq),
                               rtol=2e-3, atol=2e-4)


def test_sharded_backward_matches_single_device_parallel():
    mesh = scenario_mesh()
    args = _random_lq(jax.random.PRNGKey(1), H=37)  # H+1 not divisible by D
    reg = jnp.asarray(1e-2)
    ks_p, Ks_p, _, _ = ilqr._parallel_lqt_backward(*args, reg)
    ks_sh, Ks_sh = sharded_lqt_backward(*args, reg, mesh=mesh)
    np.testing.assert_allclose(np.asarray(ks_sh), np.asarray(ks_p),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Ks_sh), np.asarray(Ks_p),
                               rtol=1e-4, atol=1e-5)
