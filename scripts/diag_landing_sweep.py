"""Sweep the landing hold (pose x gains) to find a setting that absorbs
the PEA rebound hop and settles into stance — the pose-hold autopilot
currently tips over on the hop's asymmetric second touchdown regardless
of gains (scripts/diag_autopilot.py traces).

Candidate poses: the reference's active choice (standing pose,
configs_go1_with_springs.py:38) and the deeper crouch its authors left
commented out (:37, [0, 1.0, -2.1]).

Usage: python scripts/diag_landing_sweep.py --cpu
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

from quadruped_springs_tpu.control import interfaces as ci
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

init_action = env.get_init_action()
crouch_q = jnp.asarray([0.0, 1.0, -2.1] * 4)
crouch_action = ci.command_to_action(env.iface, crouch_q)
step = jax.jit(env.step)
reset = jax.jit(env.reset)
G = 9.81

COMBOS = [
    ("stand kp75 kd1", init_action, 75.0, 1.0),
    ("stand kp60 kd3", init_action, 60.0, 3.0),
    ("crouch kp75 kd1", crouch_action, 75.0, 1.0),
    ("crouch kp60 kd3", crouch_action, 60.0, 3.0),
    ("crouch kp60 kd5", crouch_action, 60.0, 5.0),
]

for name, land_a, kp_v, kd_v in COMBOS:
    kp = jnp.full(12, kp_v)
    kd = jnp.full(12, kd_v)
    state, obs = reset(jax.random.PRNGKey(7))
    phase, held, deadline = 0, jnp.zeros(6), 0.0
    outcome, settle, h_min2 = "ran out", 0, 9.9
    for t in range(240):
        pol_a = linear_policy_apply(W, vnorm.normalize(on, obs))
        action = [pol_a, held, land_a][phase]
        use_soft = phase == 2
        state2, obs2, r, done, info = step(
            state, action,
            kp=jnp.where(use_soft, kp, jnp.broadcast_to(env.cfg.motor_kp, (12,))),
            kd=jnp.where(use_soft, kd, jnp.broadcast_to(env.cfg.motor_kd, (12,))))
        st = env.sim_time(state2)
        if phase == 0 and bool(state2.task.switched_controller):
            phase, held = 1, action
            deadline = st + float(state2.robot.lin_vel[2]) / G
        if phase == 1 and st >= deadline:
            phase = 2
        nfeet = int(jnp.sum(state2.feet_in_contact))
        vz = float(state2.robot.lin_vel[2])
        h = float(state2.robot.pos[2])
        if phase == 2 and t > 110:
            h_min2 = min(h_min2, h)
        settle = settle + 1 if (nfeet == 4 and abs(vz) < 0.08) else 0
        if settle >= 30:
            outcome = f"SETTLED at t={t} h={h:.3f}"
            break
        if bool(done):
            outcome = (f"done t={t} term={bool(info['task_terminated'])} "
                       f"h={h:.3f}")
            break
        state, obs = state2, obs2
    print(f"{name:18s} -> {outcome}  (min h after hop {h_min2:.3f})",
          flush=True)
