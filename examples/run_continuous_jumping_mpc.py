"""Sustained continuous jumping, closed-loop: receding-horizon MPC (MPPI)
drives the stiff 1 kHz simulator through >=4 consecutive forward jumps.

This is the closed-loop counterpart of the 2-cycle open-loop fidelity
trace (utils/verification.py task_action_script: each landing perturbs the
state chaotically, so sustaining cycles is the job of FEEDBACK, exactly as
the reference sustains them with its landing/rest autopilot wrappers and
policies, task_base.py:283-400). The env runs CONTINUOUS_JUMPING_FORWARD3
so the task's per-jump statistics (fwd_array / height_array /
performance_array, robot_tasks.py:168-212) score the run.

Usage: python examples/run_continuous_jumping_mpc.py [--cpu] [--seconds 6]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax


def run(seconds: float = 6.0, replan_every: int = 2, seed: int = 0,
        verbose: bool = True, render_to: str | None = None,
        horizon: int = 40, n_samples: int = 32, iterations: int = 4,
        cost_overrides: tuple = ()):
    import jax.numpy as jnp
    import numpy as np

    from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
    from quadruped_springs_tpu.models import spatial as sp
    from quadruped_springs_tpu.solver import mppi
    from quadruped_springs_tpu.solver.mpc import (MPCConfig, MPCProblem,
                                                  state_to_vec)

    env = QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="CONTINUOUS_JUMPING_FORWARD3",
        observation_space_mode="PPO_CONTINUOUS_JUMPING_FORWARD",
        action_space_mode="SYMMETRIC", obs_noise=False,
        env_randomizer_mode="NONE", max_ep_len=float(seconds) + 1.0))
    # H=40 (0.4 s) so the planner spans a full hop cycle — flight alone
    # is ~0.35 s at the apex target; at H=25 the planner never commits
    # to a full jump (the round-3 micro-hop trace). Cost targets and
    # horizon sweepable via cost_overrides (scripts/sweep_continuous.py).
    prob = MPCProblem(MPCConfig(task="CONTINUOUS_JUMPING_FORWARD",
                                horizon=horizon, iterations=iterations,
                                n_alphas=4, cost_overrides=cost_overrides))
    mcfg = mppi.MPPIConfig(horizon=horizon, iterations=iterations,
                           n_samples=n_samples, sigma=0.25,
                           fused_accept=True)

    state, _ = env.reset(jax.random.PRNGKey(seed))
    u_warm = prob.task_warm_start(crouch_knots=6)[: horizon]
    key = jax.random.PRNGKey(seed + 1)
    n_steps = int(seconds * 100)
    zs, xs_track = [], []
    rec_q, rec_pos, rec_rpy = [], [], []
    for t in range(n_steps):
        x = state_to_vec(state.robot)
        if t % replan_every == 0:
            key, k = jax.random.split(key)
            sol = prob.solve_mppi(x, u_warm, k, mcfg)
            u_warm = sol.us
        action = u_warm[0]
        u_warm = jnp.concatenate([u_warm[1:], u_warm[-1:]], axis=0)
        state, _, _, done, _ = env.step(state, action)
        zs.append(float(state.robot.pos[2]))
        xs_track.append(float(state.robot.pos[0]))
        if render_to is not None:
            rec_q.append(np.asarray(state.robot.q))
            rec_pos.append(np.asarray(state.robot.pos))
            rec_rpy.append(np.asarray(sp.quat_to_rpy(state.robot.quat)))
        if bool(done):
            break

    from quadruped_springs_tpu.tasks.tasks import continuous_jump_stats
    out = {"sim_seconds": round(float(env.sim_time(state)), 2)}
    out.update(continuous_jump_stats(state.task))
    out.update({
        "total_fwd_m": round(xs_track[-1] - xs_track[0], 3) if xs_track else 0.0,
        "final_z_m": round(zs[-1], 3) if zs else 0.0,
        "max_z_m": round(max(zs), 3) if zs else 0.0,
    })
    if render_to is not None:
        from quadruped_springs_tpu.utils import render
        recs = {"q": np.stack(rec_q), "base_pos": np.stack(rec_pos),
                "base_rpy": np.stack(rec_rpy),
                "valid": np.ones(len(rec_q), bool)}
        os.makedirs(os.path.dirname(render_to) or ".", exist_ok=True)
        out["video"] = render.render_rollout(
            recs, render_to, camera_mode="CONTINUOUS_JUMPING_FORWARD",
            stride=3)
    if verbose:
        print(json.dumps(out, indent=2))
    return out, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--replan-every", type=int, default=2)
    ap.add_argument("--render-to", default=None,
                    help="optional gif/mp4 path (stick-figure renderer, "
                         "CONTINUOUS_JUMPING_FORWARD camera track)")
    ap.add_argument("--save-kpis", default=None,
                    help="write the KPI dict as JSON (the committed "
                         "artifact is examples/out/continuous_jumping_kpis"
                         ".json, gated by tests/test_artifacts.py)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    out, _ = run(args.seconds, args.replan_every, render_to=args.render_to)
    if args.save_kpis:
        with open(args.save_kpis, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {args.save_kpis}")


if __name__ == "__main__":
    main()
