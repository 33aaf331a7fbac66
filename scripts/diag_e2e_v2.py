"""End-to-end stages 2-4 from the LANDING expert (diag_ars_land.py):
policy-only demos (the expert lands by itself — no autopilot), multi-demo
BC, critic warmup, dense-task PPO fine-tune with frozen obs stats.

Usage: python scripts/diag_e2e_v2.py --cpu [--ft-iters 100]
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
ap.add_argument("--n-demos", type=int, default=6)
ap.add_argument("--ft-iters", type=int, default=100)
ap.add_argument("--warmup", type=int, default=30)
ap.add_argument("--ft-ep-len", type=float, default=2.0)
ap.add_argument("--ft-log-std", type=float, default=-2.0)
ap.add_argument("--kl-stop", type=float, default=0.02)
ap.add_argument("--ft-lr", type=float, default=1e-4)
ap.add_argument("--noise-rho", type=float, default=0.0)
ap.add_argument("--rsi", action="store_true")
ap.add_argument("--no-filter", action="store_true")
ap.add_argument("--expert", default="/tmp/ars_expert_land.npz")
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
from quadruped_springs_tpu.utils import demo as demo_util

z = np.load(args.expert)
W = jnp.asarray(z["W"])
on = vnorm.RunningNorm(jnp.asarray(z["mean"]), jnp.asarray(z["var"]),
                       jnp.asarray(z["count"]))
print(f"landing expert: ret {float(z['ret']):+.3f}")

collect_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=1.9,
    enable_action_filter=not args.no_filter))


def expert(obs):
    return linear_policy_apply(W, vnorm.normalize(on, obs))


N_ROWS = 185
keys = jax.random.split(jax.random.PRNGKey(7), args.n_demos)
rows, valid, _ = jax.jit(jax.vmap(
    lambda k: dp.collect_demo(collect_env, expert, k, max_steps=N_ROWS,
                              autopilot=False)
))(keys)
rows, valid = np.asarray(rows), np.asarray(valid)
kept = []
for d in range(args.n_demos):
    n_valid = int(valid[d].sum())
    landed = bool(rows[d, :n_valid, -1].any())
    ok = n_valid == N_ROWS and landed
    print(f"demo {d}: rows {n_valid} landed {landed} -> "
          f"{'keep' if ok else 'drop'}")
    if ok:
        kept.append(rows[d])
print(f"kept {len(kept)}/{args.n_demos}")
np.savez("/tmp/demo_lib_v2.npz", demos=np.stack(kept))

demo0 = jnp.asarray(kept[0])
demo_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE_DEMO",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=2.5),
    demo_actions=demo_util.demo_actions(demo0, 6))
ft_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE_PPO",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=args.ft_ep_len))

ft_cfg = PPOConfig(n_envs=32, segment_len=64, reset_bank_size=16,
                   lr=args.ft_lr, kl_stop=args.kl_stop, ent_coef=0.0,
                   freeze_obs_norm=True, noise_rho=args.noise_rho)
rsi_demo = None  # set after demos are kept when --rsi
ppo_ft = None  # built after demo collection (needs the RSI demo)

rsi_demo = demo0 if args.rsi else None
ppo_ft = PPOTrainer(ft_env, ft_cfg, demo=rsi_demo)
ppo_warm = PPOTrainer(ft_env, dataclasses.replace(
    ft_cfg, lr=3e-4, freeze_actor=True), demo=rsi_demo)

obs_list, act_list = [], []
for i, d in enumerate(kept):
    o, a = bc.demo_dataset(demo_env, jnp.asarray(d), jax.random.PRNGKey(21 + i))
    obs_list.append(o)
    act_list.append(a)
bc_obs = jnp.concatenate(obs_list, axis=0)
bc_acts = jnp.concatenate(act_list, axis=0)
bc_params, bc_norm, bc_mse = bc.fit(
    ppo_ft.net, bc_obs, bc_acts, jax.random.PRNGKey(22),
    log_std=args.ft_log_std)
print(f"[BC] {bc_obs.shape[0]} pairs, mse {float(bc_mse):.6f}")

N_EP, T = 16, 200
states, obs0 = ro.make_reset_bank(ft_env, jax.random.PRNGKey(5), N_EP)


@jax.jit
def probe(params, obs_norm):
    def policy(obs):
        mean, _, _ = ppo_ft.net.apply(params, vnorm.normalize(obs_norm, obs))
        return jnp.clip(mean, -1.0, 1.0)
    rets, info = ro.episode_returns(ft_env, policy, states, obs0, T)
    return (jnp.mean(rets), jnp.mean(info["length"]),
            jnp.mean(info["max_height"]), jnp.max(info["max_height"]))


def report(tag, fsp, fso):
    r, l, am, ax = (float(x) for x in probe(fsp, fso))
    print(f"{tag} ret {r:+.3f} len {l:5.1f} apex mean {am:.3f} max {ax:.3f}",
          flush=True)


fs = ppo_ft.init(jax.random.PRNGKey(2))
fs = ppo_ft.warm_start(fs, bc_params, bc_norm, jax.random.PRNGKey(3),
                       reset_value=True)
report("[BC warm   ]", fs.params, fs.obs_norm)
for i in range(args.warmup):
    fs, m = ppo_warm.train_step(fs)
    if i % 10 == 9:
        report(f"[warmup {i:03d}] vf {float(m['vf_loss']):.4f}",
               fs.params, fs.obs_norm)
for i in range(args.ft_iters):
    fs, m = ppo_ft.train_step(fs)
    if i % 10 == 9:
        report(f"[ft {i:03d}] r {float(m['mean_reward']):+.4f} "
               f"kl {float(m['kl_est']):.3f}", fs.params, fs.obs_norm)
