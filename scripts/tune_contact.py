"""Sweep compliant-contact parameters against the rigid-LCP oracle trace.

Replays the oracle action sequence through the ANCHORED execution model
for a grid of (contact_stiffness, contact_damping, tangential_stiffness,
tangential_damping) passed as runtime arrays (one compile, vmapped sweep).
Metrics per candidate: knot-mean torque deviation per phase, flight apex
difference, and touchdown-time offset — used to pick the execution-model
constants that best match PyBullet-style rigid contact.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from quadruped_springs_tpu.control import interfaces as ci  # noqa: E402
from quadruped_springs_tpu.env import randomizers as rnd  # noqa: E402
from quadruped_springs_tpu.models import dynamics as dyn  # noqa: E402
from quadruped_springs_tpu.ops import actuation as act  # noqa: E402
from quadruped_springs_tpu.runtime import trajstore  # noqa: E402
from quadruped_springs_tpu.utils import verification as V  # noqa: E402

TASK = sys.argv[1] if len(sys.argv) > 1 else "JUMPING_IN_PLACE"
env = V.fidelity_env(TASK)
cfg = env.cfg
scen = rnd.nominal_params(cfg)
model = rnd.model_from_params(scen)
trace = trajstore.read(f"tests/data/oracle_{TASK.lower()}.qsts")
ref = V.split_trace(trace, env.action_dim)
actions = jnp.asarray(ref["action"], jnp.float32)
settle_q = ci.reference_to_command(env.iface, env.iface.init_pose)


def replay(kn, dn, kt, ct):
    params = dyn.default_sim_params(0.001).replace(
        contact_stiffness=kn, contact_damping=dn,
        tangential_stiffness=kt, tangential_damping=ct)

    def sub(carry, q_des):
        r, a = carry
        tau, tau_m, _ = act.motor_and_spring_torque(
            cfg, q_des, r.q, r.qd)
        r2, inf = dyn.step(model, params, r, tau, cfg.velocity_limits,
                           foot_anchor=a)
        return (r2, inf["new_anchor"]), tau_m

    robot = dyn.RobotState(
        pos=cfg.init_position, quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
        lin_vel=jnp.zeros(3), ang_vel=jnp.zeros(3),
        q=cfg.init_joint_angles, qd=jnp.zeros(12))
    p0, _, _ = dyn.foot_state_world(model, robot)
    carry = (robot, p0[:, :2])
    carry, _ = jax.lax.scan(
        lambda c, _: (sub(c, settle_q)[0], None), carry, None, length=2500)

    def knot(carry, a):
        q_des = ci.action_to_command(env.iface, a)
        carry, tau_ms = jax.lax.scan(lambda c, _: sub(c, q_des), carry,
                                     None, length=10)
        r = carry[0]
        return carry, (tau_ms.mean(0), r.pos[2])

    _, (tau_mean, zs) = jax.lax.scan(knot, carry, actions)
    return tau_mean, zs


sweep = jax.jit(jax.vmap(replay))

cands = [
    # kn, dn, kt, ct
    (150e3, 100.0, 60e3, 50.0),   # best of previous sweep
    (220e3, 100.0, 60e3, 50.0),
    (220e3, 100.0, 100e3, 60.0),
    (150e3, 100.0, 100e3, 60.0),
    (220e3, 140.0, 100e3, 60.0),
    (180e3, 100.0, 80e3, 50.0),
    (220e3, 100.0, 140e3, 70.0),
    (150e3, 100.0, 140e3, 70.0),
    (220e3, 80.0, 100e3, 40.0),
    (180e3, 120.0, 120e3, 60.0),
    (240e3, 100.0, 120e3, 60.0),
    (200e3, 100.0, 100e3, 50.0),
]
kns, dns, kts, cts = [jnp.asarray(x, jnp.float32) for x in zip(*cands)]
tau_means, zs = jax.block_until_ready(sweep(kns, dns, kts, cts))

tau_lim = np.asarray(cfg.torque_limits)
ref_tm = np.asarray(ref["tau_mean"])
z_ref = np.asarray(ref["pos"][:, 2])
apex_ref = z_ref.max()
ia_ref = int(z_ref.argmax())
# ref touchdown: first post-apex knot where z drops below near-stance
td_ref = ia_ref + int(np.argmax(z_ref[ia_ref:] < 0.35))

for i, (kn, dn, kt, ct) in enumerate(cands):
    tm = np.asarray(tau_means[i])
    z = np.asarray(zs[i])
    dev = np.abs(tm - ref_tm) / tau_lim
    per = dev.max(axis=1)
    apex = z.max()
    ia = int(z.argmax())
    td = ia + int(np.argmax(z[ia:] < 0.35))
    # landing segment aligned at touchdown
    shift = td - td_ref
    n_tail = min(len(z) - td, len(z) - td_ref)
    tail_dev = (np.abs(tm[td:td + n_tail] - ref_tm[td_ref:td_ref + n_tail])
                / tau_lim).max() if n_tail > 0 else np.nan
    pre = min(td, td_ref) - 1
    print(f"kn={kn/1e3:4.0f}k dn={dn:4.0f} kt={kt/1e3:3.0f}k ct={ct:3.0f} | "
          f"settle[0:10] {per[:10].max():.4f} | crouch[10:30] "
          f"{per[10:30].max():.4f} | launch[30:38] {per[30:38].max():.4f} | "
          f"flight {per[40:85].max():.4f} | apexΔ {1000*(apex-apex_ref):+5.1f}mm "
          f"| tdΔ {shift:+d} | pre-td {per[:pre].max():.4f} | "
          f"aligned-tail {tail_dev:.4f}")
print(f"ref apex {apex_ref:.3f} @ {ia_ref}, ref touchdown ~{td_ref}")
