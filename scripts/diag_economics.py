"""Measure the dense-task (JUMPING_IN_PLACE_PPO) reward economics that
drive the fine-tune stage: does jumping actually out-pay standing
on-policy, and how does exploration noise change that?

  * deterministic BC-jump policy: return / episode length / apex
    (does the episode end early post-landing, forfeiting standing pay
    and eating the -0.25*max_height malus?)
  * "stand still" policy (the local optimum): same metrics
  * BC policy + per-step Gaussian noise at sigma in {0.135, 0.082, 0.05}:
    mean return (the on-policy value PPO actually sees)

Usage: python scripts/diag_economics.py --cpu
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from quadruped_springs_tpu.env import demo_pipeline as dp
from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.train import bc
from quadruped_springs_tpu.train import normalize as vnorm
from quadruped_springs_tpu.train import rollout as ro
from quadruped_springs_tpu.train.ppo import PPOConfig, PPOTrainer
from quadruped_springs_tpu.utils import demo as demo_util

demo = dp.load_demo_library("examples/out/demo_jip.qsts")
acts = demo_util.demo_actions(demo, 6)
demo_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE_DEMO",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=2.0), demo_actions=acts)
ft_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE_PPO",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=2.0))

tr = PPOTrainer(ft_env, PPOConfig())
bc_obs, bc_acts = bc.demo_dataset(demo_env, demo, jax.random.PRNGKey(21))
bc_params, bc_norm, _ = bc.fit(
    tr.net, bc_obs, bc_acts, jax.random.PRNGKey(22), log_std=-2.0)

N_EP, T = 16, 200
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


report("BC jump (deterministic)", bc_policy)
report("stand-still (action=0)", stand_policy)

for i, sigma in enumerate((0.135, 0.082, 0.05)):
    def noisy(obs, _s=sigma, _i=i):
        key = jax.random.fold_in(jax.random.PRNGKey(77), _i)
        # fold per-call state via obs hash is overkill; per-step fresh
        # noise keyed on obs sum keeps it jit-pure and uncorrelated enough
        k = jax.random.fold_in(key, jnp.int32(
            jnp.sum(obs * 1e3).astype(jnp.int32)))
        mean, _, _ = tr.net.apply(bc_params, vnorm.normalize(bc_norm, obs))
        return jnp.clip(
            mean + _s * jax.random.normal(k, mean.shape), -1.0, 1.0)
    report(f"BC + noise sigma={sigma}", noisy)
