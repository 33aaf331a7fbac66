"""Diagnostic: does PPO imitation learn? Sweeps exploration/optimizer
knobs and reports both the TRAIN reward (noisy policy) and a DETERMINISTIC
eval return (the metric that matters: perfect imitation = 1.0).

Loads the committed demo (examples/out/demo_jip.qsts).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--n-envs", type=int, default=16)
    ap.add_argument("--segment", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--ent", type=float, default=0.0)
    ap.add_argument("--log-std", type=float, default=None)
    ap.add_argument("--rsi", action="store_true")
    ap.add_argument("--demo", default="examples/out/demo_jip.qsts")
    args = ap.parse_args()

    from quadruped_springs_tpu.env import demo_pipeline as dp
    from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
    from quadruped_springs_tpu.train import normalize as vnorm
    from quadruped_springs_tpu.train import rollout as ro
    from quadruped_springs_tpu.train.ppo import PPOConfig, PPOTrainer
    from quadruped_springs_tpu.utils import demo as demo_util

    demo = dp.load_demo_library(args.demo)
    print(f"demo: {demo.shape[0]} steps; perfect det-eval return = 1.0")
    env = QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="JUMPING_IN_PLACE_DEMO",
        observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
        settling_steps=600, max_ep_len=2.0),
        demo_actions=demo_util.demo_actions(demo, 6))
    cfg = PPOConfig(n_envs=args.n_envs, segment_len=args.segment,
                    reset_bank_size=16, lr=args.lr, ent_coef=args.ent)
    tr = PPOTrainer(env, cfg, demo=demo if args.rsi else None)
    ts = tr.init(jax.random.PRNGKey(1))
    if args.log_std is not None:
        p = dict(ts.params["params"])
        p["log_std"] = jnp.full_like(p["log_std"], args.log_std)
        ts = ts.replace(params={"params": p})

    eval_states, eval_obs = ro.make_reset_bank(env, jax.random.PRNGKey(99), 4)

    @jax.jit
    def det_eval(params, obs_norm):
        def policy(obs):
            o = vnorm.normalize(obs_norm, obs)
            mean, _, _ = tr.net.apply(params, o)
            return jnp.clip(mean, -1.0, 1.0)
        rets, _ = ro.episode_returns(env, policy, eval_states, eval_obs, 100)
        return jnp.mean(rets)

    t0 = time.time()
    for i in range(args.iters):
        ts, m = tr.train_step(ts)
        if i % 25 == 0 or i == args.iters - 1:
            ev = float(det_eval(ts.params, ts.obs_norm))
            ls = float(np.mean(np.asarray(ts.params["params"]["log_std"])))
            print(f"[{i:04d}] train {float(m['mean_reward']):.5f}  "
                  f"det-eval {ev:.4f}  log_std {ls:+.2f}  "
                  f"kl {float(m['approx_kl']):+.4f}  "
                  f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
