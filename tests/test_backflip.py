"""Backflip trajectory optimization: the solver must discover substantial
backward rotation from the generic crouch-extend warm start (a compressed
version of examples/run_backflip.py — full rotation needs H=60)."""

import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.models import spatial as sp
from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem


def test_backflip_solver_finds_rotation():
    prob = MPCProblem(MPCConfig(task="BACKFLIP", horizon=25,
                                iterations=6, n_alphas=4))
    sol = prob.solve(prob.default_x0(), prob.task_warm_start())
    xs = np.asarray(sol.xs)
    pitch = np.array([
        float(sp.pitch_unwrapped_yxz(jnp.asarray(q), jnp.asarray(False)))
        for q in xs[:, 3:7]])
    total = float(np.ptp(np.unwrap(pitch)))
    trace = np.asarray(sol.cost_trace)
    assert np.all(np.diff(trace) <= 1e-5)
    assert bool(np.isfinite(np.asarray(sol.us)).all())
    assert total > 1.0, f"only {np.degrees(total):.0f} deg of rotation"
