"""Jumping forward, solver-driven, closed-loop: the JUMPING_FORWARD-cost
MPC plans the launch from the settled state; the plan executes on the
stiff 1 kHz simulator through the LandingWrapper autopilot (repeat action
to peak, landing pose to touchdown — landing_wrapper.py:38-69), and the
task's own yaw-aligned forward-distance tracker scores the jump
(task_base.py:109-121).

Usage: python examples/run_jumping_forward_mpc.py [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax


def run(seed: int = 0, verbose: bool = True):
    import jax.numpy as jnp
    import numpy as np

    from quadruped_springs_tpu.env import wrappers as wr
    from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
    from quadruped_springs_tpu.solver import mppi
    from quadruped_springs_tpu.solver.mpc import (MPCConfig, MPCProblem,
                                                  state_to_vec)

    env = QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="JUMPING_FORWARD",
        observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
        obs_noise=False, env_randomizer_mode="NONE", max_ep_len=4.0))
    w = wr.LandingWrapper(env)

    state, _ = env.reset(jax.random.PRNGKey(seed))
    x_start = float(state.robot.pos[0])
    prob = MPCProblem(MPCConfig(task="JUMPING_FORWARD", horizon=30,
                                iterations=8, n_alphas=4))
    mcfg = mppi.MPPIConfig(horizon=30, iterations=8, n_samples=64,
                           sigma=0.3, fused_accept=True)
    sol = prob.solve_mppi(state_to_vec(state.robot),
                          prob.task_warm_start(crouch_knots=10)[:30],
                          jax.random.PRNGKey(seed + 1), mcfg)
    plan = sol.us

    out = None
    for i in range(60):
        a = plan[min(i, plan.shape[0] - 1)]
        out = w.step(state, a)
        state = out.state
        if bool(out.done):
            break

    ts = state.task
    # forward distance = base x-displacement over the run (the reference's
    # own EvaluationWrapper scores forward progress by logging base x,
    # evaluation_wrapper.py; the task's max_forward_distance field is NOT
    # usable after the landing hold because the reference semantics zero
    # it on grounded steps, task_base.py:107 — faithfully reproduced in
    # tasks.py _update_common)
    result = {
        "planned_apex_m": float(jnp.max(sol.xs[:, 2])),
        "fwd_distance_m": float(state.robot.pos[0]) - x_start,
        "task_fwd_peak_m": float(ts.max_forward_distance),
        "apex_rel_m": float(ts.relative_max_height),
        "final_z": float(state.robot.pos[2]),
        "steps": i,
        "sim_s": float(env.sim_time(state)),
    }
    if verbose:
        print(json.dumps(result, indent=2))
    return result, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    run()


if __name__ == "__main__":
    main()
