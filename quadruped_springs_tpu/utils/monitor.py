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


def plot_rollout(recs, path_prefix: str) -> list:
    """Matplotlib plot families (heights, joints, torques, contact forces,
    spring torques) — saved as PNGs, headless."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    valid = np.asarray(recs["valid"])
    t = np.asarray(recs["time"])[valid]
    out = []

    def fig_save(name, plot_fn):
        fig, ax = plt.subplots(figsize=(8, 4))
        plot_fn(ax)
        ax.set_xlabel("time [s]")
        ax.legend(loc="best", fontsize=7)
        p = f"{path_prefix}_{name}.png"
        fig.savefig(p, dpi=100, bbox_inches="tight")
        plt.close(fig)
        out.append(p)

    fig_save("base", lambda ax: (
        ax.plot(t, np.asarray(recs["base_pos"])[valid, 2], label="z"),
        ax.plot(t, np.asarray(recs["base_pos"])[valid, 0], label="x"),
        ax.plot(t, np.asarray(recs["base_rpy"])[valid, 1], label="pitch")))
    fig_save("joints_FR", lambda ax: [
        ax.plot(t, np.asarray(recs["q"])[valid, i], label=n)
        for i, n in enumerate(("hip", "thigh", "calf"))])
    fig_save("torques_FR", lambda ax: [
        ax.plot(t, np.asarray(recs["tau_motor"])[valid, i], label=f"motor {n}")
        for i, n in enumerate(("hip", "thigh", "calf"))] + [
        ax.plot(t, np.asarray(recs["tau_spring"])[valid, i], "--",
                label=f"spring {n}")
        for i, n in enumerate(("hip", "thigh", "calf"))])
    fig_save("contact", lambda ax: [
        ax.plot(t, np.asarray(recs["feet_forces"])[valid, i], label=f"foot {i}")
        for i in range(4)])
    return out
