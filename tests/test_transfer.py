"""Planner->executor transfer gate (the load-bearing justification for
benching on the relaxed 200 Hz / 4 kN planner model): solutions planned on
the relaxed model, executed OPEN-LOOP on the stiff 1 kHz env (180 kN/m,
anchor stiction, the exact execution path of env/env.py), must reproduce
the planned behavior — a real jump with matching apex — and land upright.

Referenced from bench.py's honest-reporting note; calibration data in
scripts/measure_transfer.py. The closed-loop (receding-horizon) variant of
this claim is exercised by examples/run_closed_loop_mpc.py and the
continuous-jumping test."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from quadruped_springs_tpu.solver import mppi
from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem, state_to_vec
from quadruped_springs_tpu.utils import verification as V


def _plan_and_execute(solver: str):
    prob = MPCProblem(MPCConfig(task="JUMPING_IN_PLACE", horizon=50,
                                iterations=10, n_alphas=8))
    env = V.fidelity_env("JUMPING_IN_PLACE")
    state, _ = env.reset(jax.random.PRNGKey(0))
    x0 = state_to_vec(state.robot)
    u0 = prob.task_warm_start()
    if solver == "mppi":
        sol = prob.solve_mppi(x0, u0, jax.random.PRNGKey(1),
                              mppi.MPPIConfig(horizon=50, iterations=10))
    else:
        sol = prob.solve(x0, u0)
    planned_apex = float(jnp.max(sol.xs[:, 2]))
    rows = np.asarray(
        V.record_golden_trace(env, sol.us, jax.random.PRNGKey(2)))
    got = V.split_trace(rows, env.action_dim)
    return planned_apex, got


@pytest.mark.parametrize("solver", ["mppi", "ilqr"])
def test_relaxed_plan_transfers_to_stiff_executor(solver):
    planned_apex, got = _plan_and_execute(solver)
    z = got["pos"][:, 2]
    executed_apex = float(z.max())
    # the plan is a real jump, and the stiff executor reproduces it
    assert planned_apex > 0.45, planned_apex
    assert executed_apex > 0.45, executed_apex
    # apex parity between the relaxed planner's prediction and the stiff
    # execution. RELATIVE band: at ~1 m jumps the relaxed model's gaps
    # (4 kN/m contact sinks ~7 cm under launch thrust, no anchor
    # stiction, 200 Hz integration) move the energy transfer at the
    # 10-20% level IN BOTH DIRECTIONS — measured on these seeds: MPPI
    # plans 1.012 executes 0.894 (-11.7%), iLQR plans 0.877 executes
    # 1.052 (+20.1%). The behavioral claim (real jump, upright landing)
    # is gated absolutely above; apex parity is gated at 25% relative.
    assert abs(planned_apex - executed_apex) < 0.25 * planned_apex, (
        planned_apex, executed_apex)
    # behavioral landing: ends upright at standing-ish height
    assert float(z[-1]) > 0.15
    assert abs(got["quat"][-1, 0]) + abs(got["quat"][-1, 1]) < 0.5


def test_closed_loop_transfer_is_tight():
    """Closed-loop (receding-horizon) transfer — the realistic deployment
    mode, and empirically far tighter than open-loop: replanning every 5
    knots absorbs the relaxed-planner model error, so the max ballistic
    apex predicted across solves must match the stiff executor's realized
    apex within 10% (measured on this seed: 0.634 planned vs 0.626
    executed = 1.3%; the open-loop band above is 25%)."""
    from examples.run_closed_loop_mpc import run

    out = run(n_steps=60, replan_every=5, verbose=False)
    planned, executed = out["planned_apex_max_m"], out["executed_apex_m"]
    # a real jump, upright landing (the behavioral claim)
    assert executed > 0.45, out
    assert out["upright"] and out["final_z_m"] > 0.15, out
    # the tight closed-loop apex band
    assert abs(planned - executed) < 0.10 * planned, out
