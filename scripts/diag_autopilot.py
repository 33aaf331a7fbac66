"""Probe WHY the demo-collection autopilot's episode terminates early
(~1.43 s): replicate collect_demo's phase machine step-by-step in Python
and print height / feet-contact / invalid-contact / termination flags
around the failure.

Usage: python scripts/diag_autopilot.py --cpu  (needs /tmp/ars_expert.npz)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.train import normalize as vnorm
from quadruped_springs_tpu.train.networks import linear_policy_apply

z = np.load("/tmp/ars_expert.npz")
W = jnp.asarray(z["W"])
on = vnorm.RunningNorm(jnp.asarray(z["mean"]), jnp.asarray(z["var"]),
                       jnp.asarray(z["count"]))

env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=2.5, enable_action_filter=True))

landing_action = env.get_landing_action()
rest_action = env.get_init_action()
n_ramp = 100
step = jax.jit(env.step)

state, obs = jax.jit(env.reset)(jax.random.PRNGKey(7))
phase, held, deadline, rest_i, settle = 0, jnp.zeros(6), 0.0, 0.0, 0
G = 9.81
for t in range(250):
    pol_a = linear_policy_apply(W, vnorm.normalize(on, obs))
    ramp = min((rest_i + 1.0) / n_ramp, 1.0)
    rest_a = held * (1 - ramp) + ramp * rest_action
    action = [pol_a, held, landing_action, rest_a][phase]
    if phase == 3:
        kp, kd = jnp.full(12, 60.0), jnp.full(12, 0.8)
    elif phase == 2:
        kp, kd = jnp.full(12, 60.0), jnp.full(12, 1.5)
    else:
        kp = jnp.broadcast_to(env.cfg.motor_kp, (12,))
        kd = jnp.broadcast_to(env.cfg.motor_kd, (12,))
    state2, obs2, r, done, info = step(state, action, kp=kp, kd=kd)
    st = env.sim_time(state2)
    switched = bool(state2.task.switched_controller)
    nfeet = int(jnp.sum(state2.feet_in_contact))
    h = float(state2.robot.pos[2])
    if phase == 0 and switched:
        phase, held = 1, action
        deadline = st + float(state2.robot.lin_vel[2]) / G
        print(f"--- t={t} take-off, deadline {deadline:.2f}")
    if phase == 1 and st >= deadline:
        phase = 2
        print(f"--- t={t} landing phase")
    vz = float(state2.robot.lin_vel[2])
    settle = settle + 1 if (nfeet == 4 and abs(vz) < 0.1) else 0
    if phase == 2 and settle >= 5:
        from quadruped_springs_tpu.control import interfaces as ci
        phase = 3
        held = ci.command_to_action(env.iface, state2.robot.q)
        print(f"--- t={t} rest phase (nfeet={nfeet})")
    if phase == 3:
        rest_i += 1
    if t % 10 == 0 or bool(done) or (phase >= 2 and t % 2 == 0):
        print(f"t={t:3d} ph={phase} h={h:.3f} nfeet={nfeet} "
              f"inv={int(state2.invalid_contact)} "
              f"term={bool(info['task_terminated'])} "
              f"timeout={bool(info['timeout'])} r={float(r):+.3f}")
    if bool(done):
        print(f"DONE at t={t} (sim {st:.2f}s)")
        break
    state, obs = state2, obs2
