"""Closed-loop backflip on the stiff 1 kHz simulator.

Reference architecture (landing_wrapper_backflip.py + an RL launch
policy): the policy crouches and fires the explosive extension; once the
task detects take-off (flying & time-to-peak > 0.06 s,
task_base.py:152-160) the LandingWrapperBackflip autopilot drives the
fixed take-off action until the unwrapped pitch passes 5π/8, then holds
the landing action to touchdown.

Launch modes:
  --launch policy (default): a LEARNED linear policy produces the launch
    (examples/policies/backflip_ars.npz, trained by
    scripts/train_behavior_policies.py: behavior-cloned from the launch
    demo, then ARS fine-tuned on the true sparse BACKFLIP reward with the
    autopilot in the training loop — the reference's learn-imitate-
    finetune methodology, load_model.py:45-47). Success = unwrapped
    pitch >= 2π and an upright landing.
  --launch mpc: the TRAJECTORY OPTIMIZER produces the launch — the
    BACKFLIP-cost MPC problem is solved from the settled state (MPPI on
    the relaxed planner model, H=24) and its solution is executed on the
    stiff simulator through the autopilot wrapper. Completes the rotation
    but the open-loop plan lands tilted (the violent-flip transfer gap).
  --launch script: the round-2 hand-scripted crouch + rear-biased
    extension, kept for comparison.

Usage: python examples/run_backflip_closed_loop.py [--cpu] [--launch policy]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax


POLICY_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "policies", "backflip_ars.npz")


def run(launch: str = "policy", crouch_knots: int = 6, max_steps: int = 60,
        seed: int = 0, verbose: bool = True):
    import jax.numpy as jnp
    import numpy as np

    from quadruped_springs_tpu.env import wrappers as wr
    from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
    from quadruped_springs_tpu.models import spatial as sp

    env = QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="BACKFLIP",
        observation_space_mode="ARS_BACKFLIP",
        action_space_mode="SYMMETRIC", obs_noise=False, max_ep_len=4.0))
    w = wr.LandingWrapperBackflip(env, variant="hold")
    wstate = None

    state, obs = env.reset(jax.random.PRNGKey(seed))

    if launch == "policy":
        from quadruped_springs_tpu.train import normalize as vnorm
        from quadruped_springs_tpu.train.networks import linear_policy_apply

        d = np.load(POLICY_PATH)
        W = jnp.asarray(d["W"])
        on = vnorm.RunningNorm(mean=jnp.asarray(d["mean"]),
                               var=jnp.asarray(d["var"]),
                               count=jnp.asarray(d["count"]))
        action_at = None  # closed-loop: action computed from obs below
    elif launch == "mpc":
        from quadruped_springs_tpu.solver import mppi
        from quadruped_springs_tpu.solver.mpc import (MPCConfig, MPCProblem,
                                                      state_to_vec)
        prob = MPCProblem(MPCConfig(task="BACKFLIP", horizon=24,
                                    iterations=8, n_alphas=4))
        mcfg = mppi.MPPIConfig(horizon=24, iterations=8, n_samples=64,
                               sigma=0.3, fused_accept=True)
        sol = prob.solve_mppi(state_to_vec(state.robot),
                              prob.task_warm_start(crouch_knots=crouch_knots)[:24],
                              jax.random.PRNGKey(seed + 1), mcfg)
        plan = sol.us

        def action_at(i):
            return plan[min(i, plan.shape[0] - 1)]
    else:
        crouch = jnp.array([0.0, 0.5, -0.9, 0.0, 0.5, -0.9])
        launch_a = jnp.array([0.0, -0.3, 0.7, 0.0, -1.0, 1.0])

        def action_at(i):
            frac = min((i + 1) / crouch_knots, 1.0)
            return frac * crouch if i < crouch_knots else launch_a

    out = None
    for i in range(max_steps):
        if launch == "policy":
            a = linear_policy_apply(W, vnorm.normalize(on, obs))
        else:
            a = action_at(i)
        if wstate is not None:
            out, wstate = w.step(state, a, wstate)
        else:
            out = w.step(state, a)
        state, obs = out.state, out.obs
        if bool(out.done):
            break

    ts = state.task
    pitch_bf = float(ts.max_pitch_bf)
    rpy = np.asarray(sp.quat_to_rpy(state.robot.quat))
    R = np.asarray(sp.quat_to_mat(state.robot.quat))
    upright = bool(R[2, 2] > 0.85 and float(state.robot.pos[2]) > 0.15)
    result = {
        "launch": launch,
        "pitch_unwrapped_rad": pitch_bf,
        "full_rotation": bool(pitch_bf >= 2 * np.pi - 0.1),
        "apex_rel_m": float(ts.relative_max_height),
        "final_z": float(state.robot.pos[2]),
        "upright": upright,
        "steps": i,
        "sim_s": float(env.sim_time(state)),
    }
    if verbose:
        print(f"launch mode: {launch}")
        print(f"unwrapped pitch max: {pitch_bf:.2f} rad "
              f"({np.degrees(pitch_bf):.0f} deg)")
        print(f"apex height: {result['apex_rel_m']:.3f} m (relative)")
        print(f"final pos z {result['final_z']:.3f}, rpy {rpy.round(2)}")
        print(f"full rotation (>=2*pi): {result['full_rotation']}")
        print(f"lands upright: {upright}")
        print(f"done at control step {i}, sim time {result['sim_s']:.2f} s")
    return result, state


MLP_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "policies", "backflip_landing_mlp.npz")
LAUNCH_ROBUST_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "policies", "backflip_launch_robust.npz")


def run_robust(seeds, nominal: bool = False, max_steps: int = 120,
               verbose: bool = True):
    """Robust backflip under the full TEST_RANDOMIZER stack: the JOINTLY
    trained linear launch policy (backflip_launch_robust.npz) flies the
    flip, the v2 autopilot (landing_wrapper_backflip2.py:50,72-83) hands
    control back at touchdown, and the small-MLP LANDING policy
    (committed examples/policies/backflip_landing_mlp.npz) stabilizes to
    the strict upright pose. Both artifacts come from one joint ARS run
    over the flattened vmappable episode
    (scripts/train_backflip_robust_joint.py; lander-only training
    plateaus at ~6/12 because tilted touchdowns drive a knee bumper into
    the ground inside the first knot after handoff — the launch must
    deliver survivable attitudes). Returns one result dict per seed."""
    import jax.numpy as jnp
    import numpy as np

    from quadruped_springs_tpu.env import wrappers as wr
    from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
    from quadruped_springs_tpu.models import spatial as sp
    from quadruped_springs_tpu.train import normalize as vnorm
    from quadruped_springs_tpu.train.networks import linear_policy_apply

    env = QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="BACKFLIP",
        observation_space_mode="ARS_BACKFLIP",
        action_space_mode="SYMMETRIC", obs_noise=not nominal,
        max_ep_len=4.0,
        env_randomizer_mode="GROUND_RANDOMIZER" if nominal
        else "TEST_RANDOMIZER"))
    w = wr.LandingWrapperBackflip(env, variant="until_grounded")

    d = np.load(LAUNCH_ROBUST_PATH)
    W = jnp.asarray(d["W"])
    on = vnorm.RunningNorm(mean=jnp.asarray(d["mean"]),
                           var=jnp.asarray(d["var"]),
                           count=jnp.asarray(d["count"]))
    m = np.load(MLP_PATH)
    mlp = {k: jnp.asarray(m[k]) for k in ("W1", "b1", "W2", "b2")}

    def mlp_apply(o):
        h = jnp.tanh(mlp["W1"] @ o + mlp["b1"])
        return jnp.clip(mlp["W2"] @ h + mlp["b2"], -1.0, 1.0)

    results = []
    for seed in seeds:
        state, obs = env.reset(jax.random.PRNGKey(seed))
        wstate = w.init_state()
        for _ in range(max_steps):
            o = vnorm.normalize(on, obs)
            a = linear_policy_apply(W, o) if bool(wstate.armed) else mlp_apply(o)
            out, wstate = w.step(state, a, wstate)
            state, obs = out.state, out.obs
            if bool(out.done):
                break
        R = np.asarray(sp.quat_to_mat(state.robot.quat))
        pitch = float(state.task.max_pitch_bf)
        r = {
            "seed": seed,
            "full_rotation": bool(pitch >= 2 * np.pi - 0.1),
            "upright": bool(R[2, 2] > 0.85 and float(state.robot.pos[2]) > 0.15),
            "pitch_deg": float(np.degrees(pitch)),
            "up_z": float(R[2, 2]),
            "final_z": float(state.robot.pos[2]),
        }
        results.append(r)
        if verbose:
            print(f"seed {seed}: pitch {r['pitch_deg']:.0f} deg "
                  f"up_z {r['up_z']:+.2f} z {r['final_z']:.2f} "
                  f"rot={r['full_rotation']} upright={r['upright']}")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--launch", default="policy",
                    choices=("policy", "mpc", "script"))
    ap.add_argument("--robust", action="store_true",
                    help="run the randomized-scenario robust backflip "
                         "(linear launch + MLP landing policy)")
    ap.add_argument("--crouch-knots", type=int, default=6)
    ap.add_argument("--max-steps", type=int, default=60)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.robust:
        res = run_robust([77000 + s for s in range(12)])
        n_rot = sum(r["full_rotation"] for r in res)
        n_up = sum(r["full_rotation"] and r["upright"] for r in res)
        print(f"rotation {n_rot}/12, strict upright {n_up}/12")
        return
    run(args.launch, args.crouch_knots, args.max_steps)


if __name__ == "__main__":
    main()
