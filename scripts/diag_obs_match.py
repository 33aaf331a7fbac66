"""Diagnostic: do exact-state-reset observations match live-rollout obs?

Replays the demo actions open-loop from a clean reset and records the obs
stream; reconstructs per-row obs via env.reset(desired_robot_state=row);
prints the per-dimension max deviation. Large deviations mean the BC
dataset is off the rollout distribution.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from quadruped_springs_tpu.env import demo_pipeline as dp
from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.train import bc
from quadruped_springs_tpu.utils import demo as demo_util


def main():
    demo = dp.load_demo_library("examples/out/demo_jip.qsts")
    env = QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="JUMPING_IN_PLACE_PPO",
        observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
        settling_steps=600, max_ep_len=2.0))
    acts = demo_util.demo_actions(demo, env.action_dim)

    # live rollout: obs BEFORE each action (obs_t pairs with action_t)
    state, obs0 = env.reset(jax.random.PRNGKey(0))

    def step(carry, a):
        state, obs = carry
        s2, o2, _, _, _ = env.step(state, a)
        return (s2, o2), obs

    (_, _), live_obs = jax.lax.scan(step, (state, obs0), acts)

    rec_obs, _ = bc.demo_dataset(env, demo, jax.random.PRNGKey(11))
    live = np.asarray(live_obs)
    rec = np.asarray(rec_obs)
    dev = np.abs(live - rec)
    print("obs dims:", live.shape)
    print("per-dim max |live - reconstructed|:")
    print(np.array2string(dev.max(axis=0), precision=3, suppress_small=True))
    print("per-dim p50:")
    print(np.array2string(np.median(dev, axis=0), precision=3,
                          suppress_small=True))
    worst = np.unravel_index(np.argmax(dev), dev.shape)
    print("worst at (row, dim):", worst, "live", live[worst], "rec",
          rec[worst])


if __name__ == "__main__":
    main()
