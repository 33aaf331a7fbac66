"""Backflip: (a) the trajectory optimizer must PLAN most of a rotation at
the full H=60 horizon (>=5 rad, the bar run_backflip.py demonstrates);
(b) the closed-loop stack — crouch launch + LandingWrapperBackflip
autopilot on the stiff 1 kHz simulator — must COMPLETE the flip: >=2π of
unwrapped pitch and an upright landing."""

import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.env import wrappers as wr
from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.models import spatial as sp
from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem


def test_backflip_solver_plans_rotation_h60():
    prob = MPCProblem(MPCConfig(task="BACKFLIP", horizon=60,
                                iterations=14, n_alphas=8))
    sol = prob.solve(prob.default_x0(), prob.task_warm_start())
    xs = np.asarray(sol.xs)
    pitch = np.array([
        float(sp.pitch_unwrapped_yxz(jnp.asarray(q), jnp.asarray(False)))
        for q in xs[:, 3:7]])
    total = float(np.ptp(np.unwrap(pitch)))
    trace = np.asarray(sol.cost_trace)
    assert np.all(np.diff(trace) <= 1e-5)
    assert bool(np.isfinite(np.asarray(sol.us)).all())
    assert total > 5.0, f"only {np.degrees(total):.0f} deg of planned rotation"


def test_backflip_closed_loop_full_flip_lands_upright():
    """The full flip on the stiff executor (examples/
    run_backflip_closed_loop.py settings): crouch ramp 6 knots, rear-biased
    launch, autopilot finishes rotation + landing."""
    env = QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="BACKFLIP",
        observation_space_mode="ARS_BACKFLIP",
        action_space_mode="SYMMETRIC", obs_noise=False, max_ep_len=4.0))
    w = wr.LandingWrapperBackflip(env, variant="hold")
    crouch = jnp.array([0.0, 0.5, -0.9, 0.0, 0.5, -0.9])
    launch = jnp.array([0.0, -0.3, 0.7, 0.0, -1.0, 1.0])
    state, _ = env.reset(jax.random.PRNGKey(0))
    for i in range(60):
        frac = min((i + 1) / 6, 1.0)
        a = frac * crouch if i < 6 else launch
        out = w.step(state, a)
        state = out.state
        if bool(out.done):
            break
    pitch_bf = float(state.task.max_pitch_bf)
    R = np.asarray(sp.quat_to_mat(state.robot.quat))
    assert pitch_bf >= 2 * np.pi - 0.1, f"rotation only {pitch_bf:.2f} rad"
    assert R[2, 2] > 0.85, f"not upright (up_z={R[2, 2]:.2f})"
    assert float(state.robot.pos[2]) > 0.15
