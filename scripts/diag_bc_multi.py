"""Multi-demo behavior cloning: the single-trajectory clone is fragile
across domain-randomized scenarios (half its rollouts crash -> PPO
fine-tune correctly unlearns the jump within 5 iterations). The
reference collects MANY demonstration episodes (get_demonstrations.py
runs the expert repeatedly and SaveDemoWrapper stores each); clone a
library of scenario-randomized demos instead and measure closed-loop
robustness on the dense env.

Usage: python scripts/diag_bc_multi.py --cpu [--n-demos 8]
Writes /tmp/demo_lib.npz (the kept demos, stacked).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--n-demos", type=int, default=8)
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.env import demo_pipeline as dp
from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.train import bc
from quadruped_springs_tpu.train import normalize as vnorm
from quadruped_springs_tpu.train import rollout as ro
from quadruped_springs_tpu.train.networks import linear_policy_apply
from quadruped_springs_tpu.train.ppo import PPOConfig, PPOTrainer

z = np.load("/tmp/ars_expert.npz")
W = jnp.asarray(z["W"])
on = vnorm.RunningNorm(jnp.asarray(z["mean"]), jnp.asarray(z["var"]),
                       jnp.asarray(z["count"]))

collect_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=2.5, enable_action_filter=True))


def expert(obs):
    return linear_policy_apply(W, vnorm.normalize(on, obs))


N_ROWS = 245
keys = jax.random.split(jax.random.PRNGKey(7), args.n_demos)
rows, valid, _ = jax.jit(jax.vmap(
    lambda k: dp.collect_demo(collect_env, expert, k, max_steps=N_ROWS)
))(keys)
rows, valid = np.asarray(rows), np.asarray(valid)
kept = []
for d in range(args.n_demos):
    n_valid = int(valid[d].sum())
    landed = bool(rows[d, :n_valid, -1].any())
    # keep demos where the autopilot completed the full horizon (no
    # crash) and a jump actually happened
    ok = n_valid == N_ROWS and landed
    print(f"demo {d}: rows {n_valid} landed {landed} -> "
          f"{'keep' if ok else 'drop'}")
    if ok:
        kept.append(rows[d])
print(f"kept {len(kept)}/{args.n_demos} demos")
np.savez("/tmp/demo_lib.npz", demos=np.stack(kept))

# ---- BC on the library -------------------------------------------------
demo0 = jnp.asarray(kept[0])
from quadruped_springs_tpu.utils import demo as demo_util

demo_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE_DEMO",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=3.0),
    demo_actions=demo_util.demo_actions(demo0, 6))
ft_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE_PPO",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=2.5))

tr = PPOTrainer(ft_env, PPOConfig())
obs_list, act_list = [], []
for i, d in enumerate(kept):
    o, a = bc.demo_dataset(demo_env, jnp.asarray(d), jax.random.PRNGKey(21 + i))
    obs_list.append(o)
    act_list.append(a)
bc_obs = jnp.concatenate(obs_list, axis=0)
bc_acts = jnp.concatenate(act_list, axis=0)
print(f"BC dataset: {bc_obs.shape[0]} pairs")
bc_params, bc_norm, bc_mse = bc.fit(
    tr.net, bc_obs, bc_acts, jax.random.PRNGKey(22), log_std=-2.0)
print(f"[BC] mse {float(bc_mse):.6f}")

N_EP, T = 16, 250
states, obs0 = ro.make_reset_bank(ft_env, jax.random.PRNGKey(5), N_EP)


def bc_policy(obs):
    mean, _, _ = tr.net.apply(bc_params, vnorm.normalize(bc_norm, obs))
    return jnp.clip(mean, -1.0, 1.0)


rets, info = jax.jit(
    lambda s, o: ro.episode_returns(ft_env, bc_policy, s, o, T)
)(states, obs0)
print(f"multi-BC: ret {float(jnp.mean(rets)):+.3f} "
      f"len {float(jnp.mean(info['length'])):5.1f} "
      f"apex mean {float(jnp.mean(info['max_height'])):.3f} "
      f"max {float(jnp.max(info['max_height'])):.3f}")
