"""Drive a full jump-in-place episode through the public API.

Equivalent user flow to the reference's `test_env()` smoke entry point
(quadruped_gym_env.py:460-476): build env, reset, roll an episode with a
crouch-then-extend jump action, print KPIs.

Usage: python examples/run_episode.py [--cpu]
"""

import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.env.wrappers import LandingWrapper


def main():
    env = QuadrupedEnv(EnvConfig(
        enable_springs=True,
        motor_control_mode="PD",
        action_space_mode="SYMMETRIC",
        task_env="JUMPING_IN_PLACE",
        observation_space_mode="ARS_BASIC",
        env_randomizer_mode="GROUND_RANDOMIZER",
    ))
    wrapper = LandingWrapper(env)

    state, obs = env.reset(jax.random.PRNGKey(0))
    print(f"reset: height={float(state.robot.pos[2]):.3f} m, "
          f"obs_dim={obs.shape[0]}, feet_in_contact={state.feet_in_contact}")

    # hand-scripted explosive jump: crouch (fold calves, thighs up), then
    # extend hard — keeps the knees clear of the ground
    crouch = jnp.array([0.0, 0.4, -0.8, 0.0, 0.4, -0.8])
    extend = jnp.array([0.0, -0.4, 1.0, 0.0, -0.4, 1.0])

    total_reward = 0.0
    for t in range(120):
        action = crouch if t < 30 else extend
        out = wrapper.step(state, action)
        state = out.state
        total_reward += float(out.reward)
        if bool(out.done):
            break

    print(f"episode done at control step {t}: "
          f"return={total_reward:.3f}")
    print(f"  max relative height = {float(out.max_height):.3f} m")
    print(f"  max fwd distance    = {float(out.max_fwd):.3f} m")
    print(f"  final height        = {float(state.robot.pos[2]):.3f} m")
    print(f"  controller switched = {bool(state.task.switched_controller)}")


if __name__ == "__main__":
    main()
