"""Diagnostic: does BC on the recorded demo reproduce the jump closed-loop?"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from quadruped_springs_tpu.env import demo_pipeline as dp
from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.train import bc
from quadruped_springs_tpu.train import normalize as vnorm
from quadruped_springs_tpu.train import rollout as ro
from quadruped_springs_tpu.train.networks import MLPPolicy


def main():
    demo = dp.load_demo_library("examples/out/demo_jip.qsts")
    env = QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="JUMPING_IN_PLACE_PPO",
        observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
        settling_steps=600, max_ep_len=2.0))
    net = MLPPolicy(env.action_dim)
    obs, acts = bc.demo_dataset(env, demo, jax.random.PRNGKey(11))
    print("dataset:", obs.shape, acts.shape)
    params, obs_norm, mse = bc.fit(net, obs, acts, jax.random.PRNGKey(12))
    print(f"BC final mse: {float(mse):.5f}")

    def policy(o):
        mean, _, _ = net.apply(params, vnorm.normalize(obs_norm, o))
        return jnp.clip(mean, -1.0, 1.0)

    states, obs0 = ro.make_reset_bank(env, jax.random.PRNGKey(13), 4)
    rets, info = ro.episode_returns(env, policy, states, obs0, 120)
    print("closed-loop apex:", [round(float(h), 3)
                                for h in info["max_height"]])


if __name__ == "__main__":
    main()
