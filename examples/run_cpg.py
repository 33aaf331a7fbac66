"""Hopf-CPG locomotion on the analytic Go1 — the hopf_network.py main loop.

Drives the non-RL path end-to-end: TORQUE motor mode, action_repeat=1,
1 kHz control (hopf_network.py:183-190): each step integrates the coupled
Hopf oscillators, maps (r, θ) to foot references, and applies the
joint-PD + JᵀF Cartesian-PD torque law through the functional env.

Usage: python examples/run_cpg.py [--cpu] [--gait TROT|WALK|PACE|BOUND]
                                  [--seconds 3.0]
"""

import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from quadruped_springs_tpu.control import cpg
from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv


def main():
    gait = "TROT"
    if "--gait" in sys.argv:
        gait = sys.argv[sys.argv.index("--gait") + 1]
    seconds = 3.0
    if "--seconds" in sys.argv:
        seconds = float(sys.argv[sys.argv.index("--seconds") + 1])

    env = QuadrupedEnv(EnvConfig(
        is_rl_gym_interface=False,
        motor_control_mode="TORQUE",
        action_repeat=1,
        enable_springs=False,
        task_env="NO_TASK",
        observation_space_mode="ENCODER",
        action_space_mode="DEFAULT",
        env_randomizer_mode="NONE",
        obs_noise=False,
    ))
    params = cpg.HopfParams(gait=gait, omega_swing=8 * jnp.pi,
                            omega_stance=4 * jnp.pi, des_step_len=0.05)
    key = jax.random.PRNGKey(0)
    state, _ = env.reset(key)
    X = cpg.init_state(params, jax.random.PRNGKey(1))

    n_steps = int(seconds * 1000)

    @jax.jit
    def step_fn(carry, _):
        state, X = carry
        X, fx, fz = cpg.cpg_update(params, X)
        tau = cpg.cpg_torques(env.cfg, state.robot.q, state.robot.qd, fx, fz)
        state, _, _, _, _ = env.step(state, tau)
        return (state, X), (state.robot.pos, state.robot.q)

    (state, X), (pos_hist, q_hist) = jax.lax.scan(
        step_fn, (state, X), None, length=n_steps)

    x_travel = float(pos_hist[-1, 0] - pos_hist[0, 0])
    h_mean = float(jnp.mean(pos_hist[:, 2]))
    h_min = float(jnp.min(pos_hist[:, 2]))
    print(f"gait={gait}: {seconds:.1f}s of 1 kHz CPG locomotion")
    print(f"  forward travel: {x_travel:.3f} m")
    print(f"  mean height:    {h_mean:.3f} m (min {h_min:.3f})")
    print(f"  final pos:      {[round(float(v), 3) for v in pos_hist[-1]]}")
    upright = h_min > 0.12
    print(f"  stayed upright: {upright}")


if __name__ == "__main__":
    main()
