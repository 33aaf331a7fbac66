"""State monitoring, KPI extraction, and plotting — MonitorState/VideoRec
equivalents, trajectory-export style.

The reference monkey-patches env.step_simulation to capture per-sim-step
state and renders matplotlib plot families incl. spring elastic energy
(utils/monitor_state.py:17-396) plus OpenCV videos (utils/video_recording.py).
Here recording is a pure rollout that stacks the robot state per control
step (or per sim substep via record_rollout(substeps=True)); plots are
generated from those arrays, and "video" is trajectory export through the
native trajstore for offline rendering — no live GUI in a TPU pipeline.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.env.env import QuadrupedEnv
from quadruped_springs_tpu.models import spatial as sp
from quadruped_springs_tpu.ops import actuation as act


def record_rollout(env: QuadrupedEnv, policy_fn: Callable, key: jax.Array,
                   max_steps: int = 200):
    """Roll one episode recording per-control-step state + signals.

    Returns a dict of stacked arrays (time-major) + the valid mask.
    """
    state0, obs0 = env.reset(key)

    def step_fn(carry, _):
        state, obs, done = carry
        action = policy_fn(obs)
        state2, obs2, r, d2, info = env.step(state, action)
        rec = {
            "time": env.sim_time(state2),
            "base_pos": state2.robot.pos,
            "base_rpy": sp.quat_to_rpy(state2.robot.quat),
            "base_vel": state2.robot.lin_vel,
            "q": state2.robot.q,
            "qd": state2.robot.qd,
            "tau_motor": state2.observed_torques,
            "tau_spring": state2.spring_torques,
            "feet_forces": state2.feet_forces,
            "feet_contact": state2.feet_in_contact,
            "reward": r,
            "action": action,
            "valid": ~done,
        }
        state_keep = jax.tree.map(lambda a, b: jnp.where(done, a, b),
                                  state, state2)
        return (state_keep, jnp.where(done, obs, obs2), done | d2), rec

    _, recs = jax.lax.scan(step_fn, (state0, obs0, jnp.asarray(False)),
                           None, length=max_steps)
    return recs


def spring_energy_trace(env: QuadrupedEnv, recs) -> jnp.ndarray:
    """Per-step total elastic energy U = Σ ½k(q-q̄)² of engaged springs
    (the monitor_state.py spring-energy plot)."""
    cfg = env.cfg
    return jax.vmap(lambda q: jnp.sum(act.spring_energy(
        q, cfg.spring_stiffness, cfg.spring_rest_angles)))(recs["q"])


def kpis(recs) -> dict:
    """Episode KPIs (EvaluationWrapper infos surface)."""
    valid = np.asarray(recs["valid"])
    z = np.asarray(recs["base_pos"])[:, 2]
    x = np.asarray(recs["base_pos"])[:, 0]
    return {
        "steps": int(valid.sum()),
        "return": float(np.asarray(recs["reward"])[valid].sum()) if valid.any() else 0.0,
        "max_height": float(z[valid].max()) if valid.any() else 0.0,
        "max_fwd": float(x[valid].max()) if valid.any() else 0.0,
        "peak_feet_force": float(
            np.asarray(recs["feet_forces"]).sum(-1)[valid].max()) if valid.any() else 0.0,
        "flight_fraction": float(
            (~np.asarray(recs["feet_contact"]).any(-1))[valid].mean()) if valid.any() else 0.0,
    }


def export_trajectory(path: str, recs) -> None:
    """Persist the recording through the native trajectory store (the
    'video' of a TPU pipeline: render offline from state)."""
    from quadruped_springs_tpu.runtime import trajstore
    valid = np.asarray(recs["valid"])
    cols = [np.asarray(recs[k]).reshape(valid.shape[0], -1) for k in
            ("time", "base_pos", "base_rpy", "base_vel", "q", "qd",
             "tau_motor", "tau_spring", "feet_forces")]
    rows = np.concatenate(cols, axis=1)[valid].astype(np.float32)
    trajstore.write(path, rows)


JOINT_TYPES = ("hip", "thigh", "calf")


def plot_rollout(recs, path_prefix: str, env: QuadrupedEnv | None = None,
                 spring_energy=None) -> list:
    """All ten MonitorState plot families (monitor_state.py:133-341,
    names per its _generate_figs list): height, angles, motor_torque,
    motor_true_velocity, feet_normal_forces, elastic_potential_energy,
    forward_jumping (x-z path), pitch, pitch_rate, actions — saved as
    PNGs, headless. Pass `env` to draw torque/velocity limit lines and to
    compute the per-joint-type spring energy."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    valid = np.asarray(recs["valid"])
    t = np.asarray(recs["time"])[valid]
    q = np.asarray(recs["q"])[valid]
    qd = np.asarray(recs["qd"])[valid]
    tau = np.asarray(recs["tau_motor"])[valid]
    pos = np.asarray(recs["base_pos"])[valid]
    rpy = np.asarray(recs["base_rpy"])[valid]
    actions = np.asarray(recs["action"])[valid]
    out = []

    def fig_save(name, fig):
        p = f"{path_prefix}_{name}.png"
        fig.savefig(p, dpi=100, bbox_inches="tight")
        plt.close(fig)
        out.append(p)

    def per_type_rows(title, data, limits=None, unit=""):
        """3 stacked axes (hip/thigh/calf), 4 legs per axis, dashed limits
        (the reference's motor_torques/config/velocities layout)."""
        fig, axs = plt.subplots(nrows=3, sharex=True, figsize=(8, 7))
        fig.suptitle(title)
        for j, (ax, nm) in enumerate(zip(axs, JOINT_TYPES)):
            ax.plot(t, data[:, j + np.array([0, 3, 6, 9])])
            if limits is not None:
                ax.plot(t, np.full_like(t, limits[j]), "k--", lw=0.8)
                ax.plot(t, np.full_like(t, -limits[j]), "k--", lw=0.8)
            ax.set_ylabel(f"{nm} {unit}")
        axs[-1].set_xlabel("time [s]")
        return fig

    tl = np.asarray(env.cfg.torque_limits)[:3] if env is not None else None
    vl = np.asarray(env.cfg.velocity_limits)[:3] if env is not None else None

    # 1 height(t)
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(t, pos[:, 2])
    fig.suptitle("height(t)")
    ax.set_xlabel("time [s]"); ax.set_ylabel("h [m]")
    fig_save("height", fig)
    # 2 motor angles
    fig_save("angles", per_type_rows("motor angles", q, unit="[rad]"))
    # 3 motor torques (with limits)
    fig_save("motor_torque",
             per_type_rows("motor torques", tau, tl, "[Nm]"))
    # 4 motor velocities (with limits)
    fig_save("motor_true_velocity",
             per_type_rows("motor velocities", qd, vl, "[rad/s]"))
    # 5 feet normal forces
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(t, np.asarray(recs["feet_forces"])[valid])
    fig.suptitle("feet normal forces")
    ax.set_xlabel("time [s]"); ax.set_ylabel("F [N]")
    fig_save("feet_normal_forces", fig)
    # 6 elastic potential energy per joint type
    fig, axs = plt.subplots(nrows=3, sharex=True, figsize=(8, 7))
    fig.suptitle("elastic energy")
    if spring_energy is None and env is not None:
        e12 = np.asarray(jax.vmap(lambda qi: act.spring_energy(
            qi, env.cfg.spring_stiffness,
            env.cfg.spring_rest_angles))(jnp.asarray(q)))
    else:
        e12 = None
    for j, (ax, nm) in enumerate(zip(axs, JOINT_TYPES)):
        if e12 is not None:
            ax.plot(t, e12[:, j + np.array([0, 3, 6, 9])])
        ax.set_ylabel(f"{nm} [J]")
    axs[-1].set_xlabel("time [s]")
    fig_save("elastic_potential_energy", fig)
    # 7 forward jumping x-z path
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(pos[:, 0], pos[:, 2])
    fig.suptitle("Jump forward motion")
    ax.set_xlabel("x [m]"); ax.set_ylabel("h [m]")
    fig_save("forward_jumping", fig)
    # 8 pitch
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(t, rpy[:, 1])
    ax.set_title("pitch"); ax.set_xlabel("time [s]"); ax.set_ylabel("p [rad]")
    fig_save("pitch", fig)
    # 9 pitch rate (finite difference of recorded pitch)
    fig, ax = plt.subplots(figsize=(8, 4))
    if len(t) > 1:
        ax.plot(t[1:], np.diff(np.unwrap(rpy[:, 1])) / np.maximum(
            np.diff(t), 1e-9))
    ax.set_title("pitch rate"); ax.set_xlabel("time [s]")
    ax.set_ylabel("dp/dt [rad/s]")
    fig_save("pitch_rate", fig)
    # 10 actions 2x3 grid (front / rear x hip/thigh/calf)
    fig, axs = plt.subplots(nrows=2, ncols=3, sharex=True, sharey=True,
                            figsize=(9, 5))
    fig.suptitle("actions")
    labels = [["hip front", "thigh front", "calf front"],
              ["hip rear", "thigh rear", "calf rear"]]
    A = actions.shape[1]
    for i in range(2):
        for j in range(3):
            idx = i * 3 + j
            if idx < A:
                axs[i][j].plot(np.arange(actions.shape[0]), actions[:, idx])
            axs[i][j].set_ylabel(labels[i][j], fontsize=8)
            axs[i][j].set_xlabel("time steps", fontsize=8)
    fig_save("actions", fig)
    return out
