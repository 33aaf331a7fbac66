"""Does the PPO imitation polish (RSI + domain randomization on the
*_DEMO reward, obs-norm frozen) make the BC clone ROBUST across
randomized scenarios? The fine-tune stage collapses within ~5 iterations
when warm-started from the raw clone because half its on-policy rollouts
crash (scripts/diag_finetune.py logs); the polish is the reference's
robustness stage — measure closed-loop mean/max apex + episode length
on the dense env as it trains.

Usage: python scripts/diag_imitate2.py --cpu [--iters 150]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--iters", type=int, default=150)
ap.add_argument("--gamma", type=float, default=0.3)
ap.add_argument("--log-std", type=float, default=-2.0)
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
from quadruped_springs_tpu.train.ppo import PPOConfig, PPOTrainer
from quadruped_springs_tpu.utils import demo as demo_util

demo = dp.load_demo_library("/tmp/demo_long.qsts")
acts = demo_util.demo_actions(demo, 6)
demo_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE_DEMO",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=3.0), demo_actions=acts)
ft_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE_PPO",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=2.5))

cfg = PPOConfig(n_envs=32, segment_len=64, reset_bank_size=16,
                gamma=args.gamma, gae_lambda=0.9, lr=3e-4, kl_stop=0.03,
                freeze_obs_norm=True)
ppo_im = PPOTrainer(demo_env, cfg, demo=demo)

bc_obs, bc_acts = bc.demo_dataset(demo_env, demo, jax.random.PRNGKey(21))
bc_params, bc_norm, bc_mse = bc.fit(
    ppo_im.net, bc_obs, bc_acts, jax.random.PRNGKey(22),
    log_std=args.log_std)
ps = ppo_im.init(jax.random.PRNGKey(1))
ps = ps.replace(params=bc_params, obs_norm=bc_norm,
                opt_state=ppo_im.tx.init(bc_params))

N_EP, T = 16, 250
states, obs0 = ro.make_reset_bank(ft_env, jax.random.PRNGKey(5), N_EP)


@jax.jit
def probe(params, obs_norm):
    def policy(obs):
        mean, _, _ = ppo_im.net.apply(params, vnorm.normalize(obs_norm, obs))
        return jnp.clip(mean, -1.0, 1.0)
    rets, info = ro.episode_returns(ft_env, policy, states, obs0, T)
    return (jnp.mean(rets), jnp.mean(info["length"]),
            jnp.mean(info["max_height"]), jnp.max(info["max_height"]))


def report(tag, ps):
    r, l, am, ax = (float(x) for x in probe(ps.params, ps.obs_norm))
    print(f"{tag} ret {r:+.3f} len {l:5.1f} apex mean {am:.3f} "
          f"max {ax:.3f}", flush=True)


report("[BC        ]", ps)
for i in range(args.iters):
    ps, m = ppo_im.train_step(ps)
    if i % 25 == 24:
        report(f"[polish {i:03d}] r_im {float(m['mean_reward']):.5f}", ps)
