"""Diagnostic: replay the recorded demo open-loop on the dense-task env.

The demo rows store the FILTERED action that actually drove the robot
(GetDemonstrationWrapper semantics). A policy that imitates those rows
perfectly still drives the env THROUGH its own 3 Hz filter — so the demo
replayed through the filter is the true ceiling of what imitation can
reproduce. Compares filter-on vs filter-off replays.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from quadruped_springs_tpu.env import demo_pipeline as dp
from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.utils import demo as demo_util


def replay(env, acts, max_steps):
    def step(carry, a):
        state, apex, done = carry
        state2, _, _, d2, info = env.step(state, a)
        state2 = jax.tree.map(lambda x, y: jnp.where(done, x, y), state, state2)
        apex = jnp.maximum(apex, jnp.where(done, 0.0, info["max_height"]))
        return (state2, apex, done | d2), info["max_height"]

    state, _ = env.reset(jax.random.PRNGKey(0))
    (state, apex, done), hs = jax.lax.scan(
        step, (state, jnp.asarray(0.0), jnp.asarray(False)), acts)
    return float(apex), float(state.robot.pos[2])


def main():
    demo = dp.load_demo_library("examples/out/demo_jip.qsts")
    acts = demo_util.demo_actions(demo, 6)
    print(f"demo: {demo.shape[0]} steps")
    for filt in (True, False):
        env = QuadrupedEnv(EnvConfig(
            enable_springs=True, task_env="JUMPING_IN_PLACE_PPO",
            observation_space_mode="ARS_BASIC",
            action_space_mode="SYMMETRIC", settling_steps=600,
            max_ep_len=2.0, enable_action_filter=filt))
        apex, final_z = replay(env, acts, demo.shape[0])
        print(f"filter={filt}: replay apex {apex:.3f} m, final z {final_z:.3f}")


if __name__ == "__main__":
    main()
