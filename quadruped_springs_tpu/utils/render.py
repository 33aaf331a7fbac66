"""Offline trajectory renderer — the VideoRec consumer.

The reference writes OpenCV mp4s from the live GUI every 10th sim step
(utils/video_recording.py:9-64). A TPU pipeline has no GUI: rendering here
consumes a recorded rollout (utils/monitor.record_rollout) or an exported
trajectory plus a camera track (utils/camera.py) and draws a stick-figure
animation of the Go1 (trunk box + 4 three-link legs from the dynamics-tree
FK) projected through the camera pose. Output is .mp4 when an ffmpeg
binary is available, else .gif (Pillow), else per-frame PNGs — so the loop
record -> camera -> video closes in every environment.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_springs_tpu.models import dynamics as dyn
from quadruped_springs_tpu.models import spatial as sp
from quadruped_springs_tpu.models.go1_params import build_model
from quadruped_springs_tpu.utils import camera as cam

TRUNK_BOX = np.array([  # trunk outline, base frame (x fwd, z up)
    [0.19, 0.0, 0.05], [0.19, 0.0, -0.05],
    [-0.19, 0.0, -0.05], [-0.19, 0.0, 0.05], [0.19, 0.0, 0.05]])


def skeleton_points(q, base_pos, base_rpy):
    """World positions of the drawable skeleton per frame.

    Args:
      q: (T, 12), base_pos: (T, 3), base_rpy: (T, 3).
    Returns:
      legs: (T, 4, 4, 3) hip/thigh/calf/foot joint chain, world.
      trunk: (T, 5, 3) trunk outline polyline, world.
    """
    model = build_model()

    def one(qi, pi, rpyi):
        quat = sp.rpy_to_quat(rpyi)
        R = sp.quat_to_mat(quat)
        fk = dyn.leg_fk_base(model, qi)
        chain = jnp.concatenate([fk["o"], fk["foot"][:, None, :]], axis=1)
        legs = pi + chain @ R.T
        trunk = pi + jnp.asarray(TRUNK_BOX, qi.dtype) @ R.T
        return legs, trunk

    legs, trunk = jax.vmap(one)(jnp.asarray(q), jnp.asarray(base_pos),
                                jnp.asarray(base_rpy))
    return np.asarray(legs), np.asarray(trunk)


def _project(points_w, eye, target):
    """Project world points to 2D through a look-at camera (weak
    perspective). points_w: (..., 3) -> (..., 2) image coords."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.array([0.0, 0.0, 1.0]))
    nr = np.linalg.norm(right)
    right = right / (nr if nr > 1e-9 else 1.0)
    up = np.cross(right, fwd)
    rel = points_w - eye
    x = rel @ right
    y = rel @ up
    z = np.maximum(rel @ fwd, 1e-3)
    return np.stack([x / z, y / z], axis=-1)


def render_rollout(recs, path: str, camera_mode: str = "CLASSIC",
                   fps: int = 25, stride: int = 2) -> str:
    """Render a recorded rollout to video; returns the file written."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.animation as anim
    import matplotlib.pyplot as plt

    valid = np.asarray(recs["valid"])
    q = np.asarray(recs["q"])[valid][::stride]
    pos = np.asarray(recs["base_pos"])[valid][::stride]
    rpy = np.asarray(recs["base_rpy"])[valid][::stride]
    if len(q) == 0:
        raise ValueError("empty rollout (no valid steps)")

    legs, trunk = skeleton_points(q, pos, rpy)
    track = cam.make_camera(camera_mode, pos)
    eyes = track.eye()

    T = len(q)
    fig, ax = plt.subplots(figsize=(6, 4.5))
    ax.set_aspect("equal")
    ax.axis("off")

    lines = [ax.plot([], [], "-o", ms=2, lw=2)[0] for _ in range(4)]
    trunk_line, = ax.plot([], [], "k-", lw=2)
    ground_line, = ax.plot([], [], color="0.6", lw=1)

    def draw(i):
        eye, tgt = eyes[i], track.target[i]
        # ground reference segment under the robot
        gx = np.linspace(pos[i, 0] - 1.2, pos[i, 0] + 1.2, 8)
        ground = np.stack([gx, np.full_like(gx, pos[i, 1]),
                           np.zeros_like(gx)], axis=-1)
        pts = [_project(legs[i, l], eye, tgt) for l in range(4)]
        ptr = _project(trunk[i], eye, tgt)
        ptg = _project(ground, eye, tgt)
        for l, line in enumerate(lines):
            line.set_data(pts[l][:, 0], pts[l][:, 1])
        trunk_line.set_data(ptr[:, 0], ptr[:, 1])
        ground_line.set_data(ptg[:, 0], ptg[:, 1])
        allp = np.concatenate(pts + [ptr, ptg])
        ax.set_xlim(allp[:, 0].min() - 0.05, allp[:, 0].max() + 0.05)
        ax.set_ylim(allp[:, 1].min() - 0.05, allp[:, 1].max() + 0.05)
        return lines + [trunk_line, ground_line]

    a = anim.FuncAnimation(fig, draw, frames=T, blit=False)
    try:
        if path.endswith(".mp4") and anim.FFMpegWriter.isAvailable():
            a.save(path, writer=anim.FFMpegWriter(fps=fps))
        else:
            if path.endswith(".mp4"):
                path = path[:-4] + ".gif"
            a.save(path, writer=anim.PillowWriter(fps=fps))
    except (ValueError, RuntimeError, ImportError):
        # last resort: per-frame PNGs next to the requested path
        base = path.rsplit(".", 1)[0]
        for i in range(T):
            draw(i)
            fig.savefig(f"{base}_{i:04d}.png", dpi=80)
        path = f"{base}_0000.png"
    finally:
        plt.close(fig)
    return path
