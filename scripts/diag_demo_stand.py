"""Stage-1+2 diagnostic: train (or load a cached) ARS expert, collect the
demonstration in an env long enough for the landing/rest autopilot to
COMPLETE (the pipeline's 1.0 s collection env times out at landing, so
the demo carries no post-landing rows and the BC clone crashes after the
jump — scripts/diag_economics.py measured return +0.18 vs +2.09 for
standing), then BC-fit and report the clone's full-horizon economics.

Caches the ARS expert at /tmp/ars_expert.npz and the demo at
/tmp/demo_long.qsts for fast fine-tune iteration.

Usage: python scripts/diag_demo_stand.py --cpu [--retrain]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--retrain", action="store_true")
ap.add_argument("--ars-iters", type=int, default=200)
ap.add_argument("--collect-len", type=float, default=2.5)
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from quadruped_springs_tpu.env import demo_pipeline as dp
from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.train import bc
from quadruped_springs_tpu.train import normalize as vnorm
from quadruped_springs_tpu.train import rollout as ro
from quadruped_springs_tpu.train.ars import ARSConfig, ARSTrainer
from quadruped_springs_tpu.train.networks import linear_policy_apply
from quadruped_springs_tpu.train.ppo import PPOConfig, PPOTrainer

CACHE = "/tmp/ars_expert.npz"
DEMO = "/tmp/demo_long.qsts"

ars_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=1.0, enable_action_filter=True))

if os.path.exists(CACHE) and not args.retrain:
    z = np.load(CACHE)
    best_W = jnp.asarray(z["W"])
    best_on = vnorm.RunningNorm(jnp.asarray(z["mean"]), jnp.asarray(z["var"]),
                                jnp.asarray(z["count"]))
    print(f"loaded cached expert (apex {float(z['apex']):.3f} m)")
else:
    ars = ARSTrainer(ars_env, ARSConfig(
        n_directions=8, top_directions=4, episode_steps=110,
        reset_bank_size=8, step_size=0.03, delta_std=0.04))
    ts = ars.init(jax.random.PRNGKey(0))
    best_W, best_on, best_apex = ts.W, ts.obs_norm, -1.0
    for i in range(args.ars_iters):
        ts, m = ars.train_step(ts)
        ev = ars.evaluate(ts, n_episodes=4)
        apex = float(ev["max_height"])
        if apex > best_apex:
            best_W, best_on, best_apex = ts.W, ts.obs_norm, apex
        if i % 10 == 9:
            print(f"[ARS {i:03d}] eval {float(ev['return_mean']):+.3f} "
                  f"apex {apex:.3f} m (best {best_apex:.3f})", flush=True)
    np.savez(CACHE, W=np.asarray(best_W), mean=np.asarray(best_on.mean),
             var=np.asarray(best_on.var), count=np.asarray(best_on.count),
             apex=best_apex)
    print(f"cached expert apex {best_apex:.3f} m")

# ---- collect the demo with room for landing + rest ramp + stance ------
collect_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=args.collect_len,
    enable_action_filter=True))


def expert(obs):
    return linear_policy_apply(best_W, vnorm.normalize(best_on, obs))


n_rows = int(args.collect_len * 100) - 5
rows, valid, _ = jax.jit(
    lambda k: dp.collect_demo(collect_env, expert, k, max_steps=n_rows)
)(jax.random.PRNGKey(7))
dp.save_demo_library(DEMO, rows, valid)
demo = dp.load_demo_library(DEMO)
print(f"[demo] {demo.shape[0]} rows (valid {int(np.sum(np.asarray(valid)))})")
flags = np.asarray(demo[:, -1])
print(f"[demo] landing flag first set at row "
      f"{int(np.argmax(flags)) if flags.any() else -1}")

# ---- BC + full-horizon economics on the dense task --------------------
from quadruped_springs_tpu.utils import demo as demo_util

acts = demo_util.demo_actions(demo, 6)
demo_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE_DEMO",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=3.0), demo_actions=acts)
ft_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE_PPO",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=2.5))

tr = PPOTrainer(ft_env, PPOConfig())
bc_obs, bc_acts = bc.demo_dataset(demo_env, demo, jax.random.PRNGKey(21))
bc_params, bc_norm, bc_mse = bc.fit(
    tr.net, bc_obs, bc_acts, jax.random.PRNGKey(22), log_std=-2.0)
print(f"[BC] mse {float(bc_mse):.6f}")

N_EP, T = 16, 250
states, obs0 = ro.make_reset_bank(ft_env, jax.random.PRNGKey(5), N_EP)


def report(name, policy):
    rets, info = jax.jit(
        lambda s, o: ro.episode_returns(ft_env, policy, s, o, T)
    )(states, obs0)
    print(f"{name:28s} return {float(jnp.mean(rets)):+.3f} "
          f"+-{float(jnp.std(rets)):.3f}  len {float(jnp.mean(info['length'])):5.1f}  "
          f"apex mean {float(jnp.mean(info['max_height'])):.3f} "
          f"max {float(jnp.max(info['max_height'])):.3f}", flush=True)


def bc_policy(obs):
    mean, _, _ = tr.net.apply(bc_params, vnorm.normalize(bc_norm, obs))
    return jnp.clip(mean, -1.0, 1.0)


def stand_policy(obs):
    return jnp.zeros((obs.shape[0], 6))


report("BC jump+stand (det)", bc_policy)
report("stand-still (action=0)", stand_policy)
