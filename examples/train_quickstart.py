"""Training quickstart: a few ARS learner steps on the jump-in-place task.

The reference trains externally with sb3-contrib ARS through rl-zoo
(README.md:44); here training is native: each ARS step evaluates
2·n_directions full episodes in one vmapped XLA program. This quickstart
runs a handful of steps with a small budget and prints the learning
signal; real runs scale n_directions/episode_steps and shard the
direction axis over a mesh (parallel/).

Two-stage recipe (load_model.py:45-47): 1) ARS on JUMPING_IN_PLACE
(this script), 2) collect demos with env/demo_pipeline.py, 3) PPO on
JUMPING_IN_PLACE_DEMO (imitation), 4) PPO fine-tune on *_PPO.

Usage: python examples/train_quickstart.py [--cpu] [--steps N]
"""

import sys
import time

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.train.ars import ARSConfig, ARSTrainer


def main():
    n_steps = 3
    if "--steps" in sys.argv:
        n_steps = int(sys.argv[sys.argv.index("--steps") + 1])

    env = QuadrupedEnv(EnvConfig(
        enable_springs=True,
        task_env="JUMPING_IN_PLACE",
        observation_space_mode="ARS_BASIC",
        action_space_mode="SYMMETRIC",
        settling_steps=500,
        # must end inside the 60-step rollout: the sparse task pays its
        # reward at episode end (robot_tasks.py:31-57)
        max_ep_len=0.5,
    ))
    trainer = ARSTrainer(env, ARSConfig(
        n_directions=8, top_directions=4, episode_steps=60,
        reset_bank_size=4))
    ts = trainer.init(jax.random.PRNGKey(0))

    print(f"ARS on JUMPING_IN_PLACE: {n_steps} steps x "
          f"{2 * 8 * 4} episodes/step")
    for i in range(n_steps):
        t0 = time.perf_counter()
        ts, metrics = trainer.train_step(ts)
        jax.block_until_ready(metrics["mean_return"])
        print(f"  step {i}: mean_return={float(metrics['mean_return']):.4f} "
              f"best={float(metrics['best_return']):.4f} "
              f"({time.perf_counter() - t0:.1f}s)")

    ev = trainer.evaluate(ts, n_episodes=4)
    print(f"eval: return {float(ev['return_mean']):.4f} "
          f"± {float(ev['return_std']):.4f}, "
          f"max_height {float(ev['max_height']):.3f} m")


if __name__ == "__main__":
    main()
