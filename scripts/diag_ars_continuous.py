"""Diag: can ARS (linear policy) learn sustained continuous jumping when
trained THROUGH the per-jump landing autopilot (env/continuous_autopilot.py
— the reference's training architecture: PPO through
landing_wrapper_continuous.py)?

Probes the stage-1 role of examples/train_continuous_policy.py. Scored by
the task's own per-jump statistics (CONTINUOUS_JUMPING_FORWARD3).

Run: python scripts/diag_ars_continuous.py [--cpu] [--iters 80]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=80)
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--eval-every", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--step-size", type=float, default=0.02)
    ap.add_argument("--delta-std", type=float, default=0.03)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from quadruped_springs_tpu.env.continuous_autopilot import (
        ContinuousAutopilotEnv)
    from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
    from quadruped_springs_tpu.tasks.tasks import continuous_jump_stats
    from quadruped_springs_tpu.train import normalize as vnorm
    from quadruped_springs_tpu.train.ars import ARSConfig, ARSTrainer
    from quadruped_springs_tpu.train.networks import linear_policy_apply

    env = ContinuousAutopilotEnv(QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="CONTINUOUS_JUMPING_FORWARD3",
        observation_space_mode="PPO_CONTINUOUS_JUMPING_FORWARD",
        action_space_mode="SYMMETRIC", obs_noise=False,
        env_randomizer_mode="NONE", settling_steps=600,
        max_ep_len=args.seconds)))
    n_steps = int(args.seconds * 100) + 10

    ars = ARSTrainer(env, ARSConfig(
        n_directions=16, top_directions=8, episode_steps=n_steps,
        reset_bank_size=8, step_size=args.step_size,
        delta_std=args.delta_std))
    ts = ars.init(jax.random.PRNGKey(args.seed))

    eval_keys = jnp.stack([jax.random.PRNGKey(30000 + i) for i in range(4)])

    @jax.jit
    def ev(W, on):
        states, obs = jax.vmap(env.reset)(eval_keys)

        def step(carry, _):
            st, ob, done = carry
            a = jnp.clip(jax.vmap(linear_policy_apply, in_axes=(None, 0))(
                W, vnorm.normalize(on, ob)), -1.0, 1.0)
            st2, ob2, _, d2, _ = jax.vmap(env.step)(st, a)
            st = jax.tree.map(lambda x, y: jnp.where(
                done.reshape((-1,) + (1,) * (x.ndim - 1)), x, y), st, st2)
            ob = jnp.where(done[:, None], ob, ob2)
            return (st, ob, done | d2), None

        B = obs.shape[0]
        (stf, _, donef), _ = jax.lax.scan(
            step, (states, obs, jnp.zeros(B, bool)), None, length=n_steps)
        return stf, donef

    def score(W, on):
        stf, donef = ev(W, on)
        rows = []
        for i in range(eval_keys.shape[0]):
            s = continuous_jump_stats(jax.tree.map(lambda x: x[i], stf.env.task))
            s["crashed"] = bool(donef[i])
            rows.append(s)
        return rows

    t0 = time.time()
    for i in range(args.iters):
        ts, m = ars.train_step(ts)
        if i % args.eval_every == args.eval_every - 1:
            rows = score(ts.W, ts.obs_norm)
            print(f"[{i:03d}] ret {float(m['mean_return']):+.3f} "
                  f"good {[r['good_jumps'] for r in rows]} "
                  f"jumps {[r['n_jumps'] for r in rows]} "
                  f"perf {[round(r['mean_perf'], 2) for r in rows]} "
                  f"fwd {[round(r['mean_fwd_m'] * r['n_jumps'], 2) for r in rows]} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    print("done", time.time() - t0)


if __name__ == "__main__":
    main()
