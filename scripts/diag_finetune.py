"""Diagnose the fine-tune erosion in isolation (skips the 12-min ARS
stage by reusing the recorded demo examples/out/demo_jip.qsts).

Hypothesis under test: the warm-started policy is a function of the
NORMALIZED observation, and the BC obs statistics carry count~100; one
2048-sample PPO update shifts them ~95% toward the on-policy
distribution, collapsing the behavior with the actor weights untouched
(even during freeze_actor critic warmup). With freeze_obs_norm=True the
apex should hold while the dense reward trains.

Usage: python scripts/diag_finetune.py --cpu [--iters 60]
       [--no-freeze-norm]  (control arm: reproduce the collapse)
"""

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--iters", type=int, default=60)
ap.add_argument("--warmup", type=int, default=30)
ap.add_argument("--no-freeze-norm", action="store_true")
ap.add_argument("--no-truncate-rest", action="store_true")
ap.add_argument("--lr", type=float, default=1e-4)
ap.add_argument("--kl-stop", type=float, default=0.02)
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from quadruped_springs_tpu.env import demo_pipeline as dp
from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.train import bc
from quadruped_springs_tpu.train.ppo import PPOConfig, PPOTrainer

demo = dp.load_demo_library("/tmp/demo_long.qsts")
print(f"demo: {demo.shape[0]} rows")

demo_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE_DEMO",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=3.0),
    demo_actions=__import__("quadruped_springs_tpu.utils.demo",
                            fromlist=["demo_actions"]).demo_actions(
        demo, 6))
ft_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE_PPO",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=2.5))

from quadruped_springs_tpu.env.wrappers import RestTruncationWrapper

freeze = not args.no_freeze_norm
train_env = ft_env if args.no_truncate_rest else RestTruncationWrapper(ft_env)
ft_cfg = PPOConfig(n_envs=32, segment_len=64, reset_bank_size=16,
                   lr=args.lr, kl_stop=args.kl_stop, ent_coef=0.0,
                   freeze_obs_norm=freeze)
ppo_ft = PPOTrainer(train_env, ft_cfg)
ppo_warm = PPOTrainer(train_env, dataclasses.replace(
    ft_cfg, lr=3e-4, freeze_actor=True))
# honest probe on the RAW env (no truncation)
probe = PPOTrainer(ft_env, ft_cfg)

bc_obs, bc_acts = bc.demo_dataset(demo_env, demo, jax.random.PRNGKey(21))
bc_params, bc_norm, bc_mse = bc.fit(
    ppo_ft.net, bc_obs, bc_acts, jax.random.PRNGKey(22), log_std=-2.0)
fs = ppo_ft.init(jax.random.PRNGKey(2))
fs = ppo_ft.warm_start(fs, bc_params, bc_norm, jax.random.PRNGKey(3),
                       reset_value=True)
ev = probe.evaluate(fs, n_episodes=8, max_steps=250)
print(f"[warm-start] apex {float(ev['max_height']):.3f} m  "
      f"(freeze_obs_norm={freeze})", flush=True)

for i in range(args.warmup):
    fs, m = ppo_warm.train_step(fs)
    if i % 10 == 9:
        ev = probe.evaluate(fs, n_episodes=8, max_steps=250)
        print(f"[warmup {i:02d}] vf {float(m['vf_loss']):.5f}  "
              f"apex {float(ev['max_height']):.3f} m", flush=True)

for i in range(args.iters):
    fs, m = ppo_ft.train_step(fs)
    if i % 5 == 4:
        ev = probe.evaluate(fs, n_episodes=8, max_steps=250)
        print(f"[finetune {i:03d}] reward {float(m['mean_reward']):+.4f} "
              f"kl {float(m['kl_est']):.4f} "
              f"apex {float(ev['max_height']):.3f} m "
              f"ret {float(ev['return_mean']):+.3f}", flush=True)
ev = probe.evaluate(fs, n_episodes=8, max_steps=250)
print(f"[final] apex {float(ev['max_height']):.3f} m "
      f"return {float(ev['return_mean']):.3f}")
