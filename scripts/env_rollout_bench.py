"""Batched env rollout throughput (the RL training axis) on the chip.

Measures vmapped QuadrupedEnv.step in a scan — batch B envs x T control
steps x action_repeat 1 kHz substeps — and prints sim-steps/s plus the
real-time factor. Run after physics changes: the anchored-stiction
contact (round 2) changed the hot path, so round-1 numbers are stale.

Usage: python scripts/env_rollout_bench.py [--cpu] [--batch 1024]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv  # noqa: E402

B = 1024
if "--batch" in sys.argv:
    B = int(sys.argv[sys.argv.index("--batch") + 1])
T = 100  # control steps per timed segment (1 s of sim time)

env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600))

keys = jax.random.split(jax.random.PRNGKey(0), B)
states, obs = jax.jit(jax.vmap(env.reset))(keys)
a0 = env.get_init_action()
actions = jnp.broadcast_to(a0, (B,) + a0.shape)


@jax.jit
def segment(states):
    def step(s, _):
        s2, _, _, _, _ = jax.vmap(env.step)(s, actions)
        return s2, None
    s, _ = jax.lax.scan(step, states, None, length=T)
    return s


t0 = time.perf_counter()
states = jax.block_until_ready(segment(states))
compile_s = time.perf_counter() - t0
reps = 3
t0 = time.perf_counter()
for _ in range(reps):
    states = jax.block_until_ready(segment(states))
dt = (time.perf_counter() - t0) / reps

sim_steps = B * T * env.config.action_repeat
print(json.dumps({
    "metric": f"env rollout sim-steps/s (batch {B}, anchored stiction)",
    "sim_steps_per_s": round(sim_steps / dt, 0),
    "realtime_factor": round(sim_steps / dt * env.config.time_step, 0),
    "compile_s": round(compile_s, 1)}))
