"""Jumping forward, closed-loop on the stiff 1 kHz simulator, through
the LandingWrapper autopilot (repeat action to peak, landing pose to
touchdown — landing_wrapper.py:38-69).

Drivers:
  --driver mpc (default): the JUMPING_FORWARD-cost MPC plans the launch
    from the settled state and the plan executes open-loop through the
    autopilot. Measured: 0.709 m forward, upright.
  --driver policy: the committed ARS policy
    (examples/policies/forward_ars.npz, plain sparse-task ARS —
    scripts/train_behavior_policies.py --task forward). Measured:
    1.011 m forward at 0.52 m apex — the learned launch out-jumps the
    open-loop plan.

Usage: python examples/run_jumping_forward_mpc.py [--cpu] [--driver mpc]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax


def run(seed: int = 0, verbose: bool = True, driver: str = "mpc"):
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

    state, obs = env.reset(jax.random.PRNGKey(seed))
    x_start = float(state.robot.pos[0])
    planned_apex = None
    if driver == "mpc":
        prob = MPCProblem(MPCConfig(task="JUMPING_FORWARD", horizon=30,
                                    iterations=8, n_alphas=4))
        mcfg = mppi.MPPIConfig(horizon=30, iterations=8, n_samples=64,
                               sigma=0.3, fused_accept=True)
        sol = prob.solve_mppi(state_to_vec(state.robot),
                              prob.task_warm_start(crouch_knots=10)[:30],
                              jax.random.PRNGKey(seed + 1), mcfg)
        plan = sol.us
        planned_apex = float(jnp.max(sol.xs[:, 2]))
    else:
        from quadruped_springs_tpu.train import normalize as vnorm
        from quadruped_springs_tpu.train.networks import linear_policy_apply
        import numpy as _np
        d = _np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "policies", "forward_ars.npz"))
        Wp = jnp.asarray(d["W"])
        on = vnorm.RunningNorm(mean=jnp.asarray(d["mean"]),
                               var=jnp.asarray(d["var"]),
                               count=jnp.asarray(d["count"]))

    out = None
    for i in range(60):
        if driver == "mpc":
            a = plan[min(i, plan.shape[0] - 1)]
        else:
            a = linear_policy_apply(Wp, vnorm.normalize(on, obs))
        out = w.step(state, a)
        state, obs = out.state, out.obs
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
        "driver": driver,
        "planned_apex_m": planned_apex,
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
    ap.add_argument("--driver", default="mpc", choices=("mpc", "policy"))
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    run(driver=args.driver)


if __name__ == "__main__":
    main()
