"""Demonstration dataset I/O + reference-state initialization (RSI).

Equivalent of:
  * GetDemonstrationWrapper (get_demonstration_wrapper.py): records one row
    per control step — [action(filtered), q(12), qd(12), base pos(3),
    base quat(4), lin vel(3), ang vel(3), landing flag(1)] — and its static
    `read_demo` splitter (:60-70).
  * SaveDemoWrapper (save_demo_wrapper.py): .npy persistence.
  * ReferenceStateInitializationWrapper (:10-43): on reset pick a random
    demo row (1-in-5 resets restricted to the first 20%) and spawn the
    robot in that exact state.

Datasets are plain arrays so they live on-device; recording during a jitted
rollout is just stacking the per-step rows from `demo_row`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from quadruped_springs_tpu.models.dynamics import RobotState


def demo_row(action, robot: RobotState, is_landing) -> jnp.ndarray:
    """One recorded row (get_demonstration_wrapper.py:36-52 layout)."""
    return jnp.concatenate([
        action, robot.q, robot.qd, robot.pos, robot.quat,
        robot.lin_vel, robot.ang_vel,
        jnp.atleast_1d(jnp.asarray(is_landing, jnp.float32)),
    ])


def read_demo(row: jnp.ndarray, action_dim: int):
    """Split one row back into its parts (read_demo, :60-70)."""
    a = row[:action_dim]
    off = action_dim
    q = row[off:off + 12]; off += 12
    qd = row[off:off + 12]; off += 12
    pos = row[off:off + 3]; off += 3
    quat = row[off:off + 4]; off += 4
    lin = row[off:off + 3]; off += 3
    ang = row[off:off + 3]; off += 3
    landing = row[off]
    return a, q, qd, pos, quat, lin, ang, landing


def demo_actions(demo: jnp.ndarray, action_dim: int) -> jnp.ndarray:
    """(T, row) -> (T, action_dim) action matrix for imitation rewards."""
    return demo[:, :action_dim]


def demo_robot_state(demo: jnp.ndarray, idx, action_dim: int) -> RobotState:
    """Robot state at demo row idx (for RSI exact-state spawn)."""
    row = demo[idx]
    _, q, qd, pos, quat, lin, ang, _ = read_demo(row, action_dim)
    return RobotState(pos=pos, quat=quat, lin_vel=lin, ang_vel=ang, q=q, qd=qd)


def rsi_index(key: jax.Array, demo_len: int) -> jnp.ndarray:
    """RSI sampling: every 5th reset (p=0.2) restrict to the first 20% of the
    trajectory (reference_state_initialization_wrapper.py:25-43)."""
    k1, k2 = jax.random.split(key)
    early = jax.random.uniform(k1) < 0.2
    hi = jnp.where(early, max(int(demo_len * 0.2), 1), demo_len)
    return jax.random.randint(k2, (), 0, hi)


def save_demo(path: str, rows: np.ndarray) -> None:
    np.save(path, np.asarray(rows))


def load_demo(path: str) -> np.ndarray:
    return np.load(path)
