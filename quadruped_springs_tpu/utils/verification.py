"""Golden-trace verification — the acceptance gate of BASELINE.json.

Replays a stored action sequence through the simulator and compares the
resulting joint-torque / state traces against a stored golden trace
(recorded from PyBullet on the reference env, or from a previous version of
this simulator as a regression baseline). The headline acceptance metric is
max joint-torque deviation < 2% of the torque limit over the horizon.

Trace format: native trajstore rows
  [t(1), action(A), q(12), qd(12), tau_motor(12), base pos(3), quat(4),
   lin vel(3), ang vel(3)]
written by `record_golden_trace`, read by `verify_against_trace`.

CLI:  python -m quadruped_springs_tpu.utils.verification record OUT.qsts
      python -m quadruped_springs_tpu.utils.verification verify TRACE.qsts
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.runtime import trajstore


def _row(env, t, action, state):
    r = state.robot
    return jnp.concatenate([
        jnp.atleast_1d(t), action, r.q, r.qd, state.observed_torques,
        r.pos, r.quat, r.lin_vel, r.ang_vel])


def record_golden_trace(env: QuadrupedEnv, actions: jnp.ndarray,
                        key: jax.Array):
    """Roll the action sequence from reset; return (T, row) trace."""
    state, obs = env.reset(key)

    def step(carry, action):
        state, = carry
        state2, obs, r, done, info = env.step(state, action)
        return (state2,), _row(env, env.sim_time(state2), action, state2)

    _, rows = jax.lax.scan(step, (state,), actions)
    return rows


def split_trace(trace: np.ndarray, action_dim: int):
    A = action_dim
    out = {}
    off = 1
    out["t"] = trace[:, 0]
    out["action"] = trace[:, off:off + A]; off += A
    out["q"] = trace[:, off:off + 12]; off += 12
    out["qd"] = trace[:, off:off + 12]; off += 12
    out["tau"] = trace[:, off:off + 12]; off += 12
    out["pos"] = trace[:, off:off + 3]; off += 3
    out["quat"] = trace[:, off:off + 4]; off += 4
    return out


def verify_against_trace(env: QuadrupedEnv, trace_path: str,
                         key: jax.Array, tol_frac: float = 0.02) -> dict:
    """Replay the trace's actions; report deviations vs the stored trace."""
    trace = trajstore.read(trace_path)
    ref = split_trace(trace, env.action_dim)
    actions = jnp.asarray(ref["action"])
    rows = np.asarray(record_golden_trace(env, actions, key))
    got = split_trace(rows, env.action_dim)

    tau_lim = np.asarray(env.cfg.torque_limits)
    tau_dev = np.abs(got["tau"] - ref["tau"]) / tau_lim
    q_dev = np.abs(got["q"] - ref["q"])
    z_dev = np.abs(got["pos"][:, 2] - ref["pos"][:, 2])
    report = {
        "steps": int(trace.shape[0]),
        "max_torque_dev_frac": float(tau_dev.max()),
        "mean_torque_dev_frac": float(tau_dev.mean()),
        "max_joint_dev_rad": float(q_dev.max()),
        "max_height_dev_m": float(z_dev.max()),
        "pass": bool(tau_dev.max() < tol_frac),
        "tolerance_frac": tol_frac,
    }
    return report


def _default_env():
    return QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="JUMPING_IN_PLACE",
        observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
        obs_noise=False))


def main(argv):
    mode, path = argv[0], argv[1]
    env = _default_env()
    key = jax.random.PRNGKey(0)
    if mode == "record":
        crouch = jnp.array([0.0, 0.4, -0.8, 0.0, 0.4, -0.8])
        extend = jnp.array([0.0, -0.4, 1.0, 0.0, -0.4, 1.0])
        actions = jnp.where((jnp.arange(100) < 30)[:, None], crouch, extend)
        rows = record_golden_trace(env, actions, key)
        trajstore.write(path, np.asarray(rows))
        print(f"recorded {rows.shape[0]} steps -> {path}")
    elif mode == "verify":
        print(json.dumps(verify_against_trace(env, path, key), indent=2))
    else:
        raise SystemExit("usage: verification.py record|verify PATH")


if __name__ == "__main__":
    main(sys.argv[1:])
