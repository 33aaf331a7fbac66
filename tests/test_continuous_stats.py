"""Per-jump statistics of the continuous-jumping tasks at high jump
counts (VERDICT r4 weak #1 / next #1).

The reference accumulates unbounded Python per-jump lists
(task_base.py:283-400); the TPU-native TaskState carries fixed buffers
plus exact streaming accumulators. These tests drive the task machinery
through synthetic flight/ground cycles — 45 jumps (the committed trace's
regime, above the old 32-slot buffer that silently clobbered) and 140
jumps (above the new 128-slot capacity) — and check every statistic
against a NumPy recomputation from the known per-cycle ground truth:

  * mean / max / last per-jump performance are EXACT at any count
    (streaming sums, not buffer reads),
  * the good-jump counter is exact,
  * buffer slots are never clobbered (first MAX_JUMPS jumps recorded),
  * the entropy term is exact up to MAX_JUMPS and finite beyond,
  * the terminal rewards (CONTINUOUS_JUMPING_FORWARD3 /
    CONTINUOUS_JUMPING_FORWARD_PPO) match the recomputation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_springs_tpu.tasks import tasks as T


def _ctx(pos, lin_vel, flying, sim_time):
    z12 = jnp.zeros(12)
    return T.TaskCtx(
        pos=jnp.asarray(pos, jnp.float32),
        lin_vel=jnp.asarray(lin_vel, jnp.float32),
        rpy=jnp.zeros(3),
        quat=jnp.array([1.0, 0.0, 0.0, 0.0]),
        q=z12, qd=z12, motor_torques=z12,
        feet_in_contact=jnp.asarray([not flying] * 4),
        feet_forces=jnp.zeros(4),
        invalid_contact=jnp.asarray(False),
        sim_time=jnp.asarray(sim_time, jnp.float32),
        is_flying=jnp.asarray(bool(flying)),
        last_action=jnp.zeros(6),
    )


def _run_cycles(td, n_cycles, rng):
    """Drive task_on_step through n_cycles hop cycles; returns the final
    TaskState plus the ground-truth per-jump (fwd, zmax) lists that the
    task should have recorded (first cycle's landing is skipped by the
    first_jump latch, task_base.py:342-355)."""
    dxs = rng.uniform(0.05, 0.7, size=n_cycles)
    zmaxs = rng.uniform(0.32, 0.55, size=n_cycles)
    t, x = 0.0, 0.0
    ctx0 = _ctx([0.0, 0.0, 0.3], [0.0, 0.0, 0.0], False, 0.0)
    ts = T.init_task_state(ctx0)
    for i in range(n_cycles):
        steps = [
            # ground
            _ctx([x, 0.0, 0.30], [0.0, 0.0, 0.0], False, t),
            # entering flight: vz=1.5 -> time-to-peak 0.153 s > 0.06
            _ctx([x, 0.0, 0.30], [1.0, 0.0, 1.5], True, t + 0.01),
            # apex
            _ctx([x + dxs[i] / 2, 0.0, zmaxs[i]], [1.0, 0.0, 0.0], True,
                 t + 0.02),
            # landing (grounded again, advanced by dx)
            _ctx([x + dxs[i], 0.0, 0.30], [0.0, 0.0, -1.0], False, t + 0.03),
        ]
        for c in steps:
            ts = T.task_on_step(td, ts, c)
        x += dxs[i]
        t += 0.04
    # first landing is skipped
    return ts, dxs[1:], zmaxs[1:]


def _expected(td, dxs, zmaxs):
    jd = np.minimum(dxs, td.jump_limit)
    jh = np.minimum(zmaxs, td.height_limit)
    perf = (td.fwd_weight * jd / td.jump_limit
            + td.height_weight * jh / td.height_limit)
    return jd, jh, perf


@pytest.mark.parametrize("task", ["CONTINUOUS_JUMPING_FORWARD3",
                                  "CONTINUOUS_JUMPING_FORWARD_PPO"])
def test_45_jump_episode_stats_match_numpy(task):
    td = T.get_task(task)
    ts, dxs, zmaxs = _run_cycles(td, 46, np.random.default_rng(0))
    jd, jh, perf = _expected(td, dxs, zmaxs)
    n = len(jd)
    assert n == 45 and n > 32  # the regime the old 32-slot buffer corrupted

    assert int(ts.jump_counter) == n
    np.testing.assert_allclose(np.asarray(ts.fwd_array)[:n], jd, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ts.height_array)[:n], jh, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ts.performance_array)[:n], perf,
                               atol=1e-5)
    # streaming accumulators == NumPy recomputation
    assert abs(float(ts.perf_sum) - perf.sum()) < 1e-4
    assert abs(float(ts.max_perf) - perf.max()) < 1e-5
    assert abs(float(ts.last_perf) - perf[-1]) < 1e-5
    assert int(ts.good_jump_counter) == int(
        (perf >= td.performance_bound).sum())
    # avg normalized by the raw counter (task_base.py:394-400)
    assert abs(float(T._avg_performance(ts)) - perf.sum() / n) < 1e-5
    # entropy: exact vs NumPy (all 45 jumps are inside the 128 buffer)
    p = jd / jd.sum()
    ent_np = -(p * np.log2(p)).sum() / np.log2(n)
    assert abs(float(T._entropy_fwd(ts)) - ent_np) < 1e-4

    # terminal reward matches a NumPy recomputation of the formula
    ctx_end = _ctx([float(np.sum(dxs)), 0.0, 0.30], [0, 0, 0], False, 6.0)
    r = float(T.task_reward_end(td, ts, ctx_end))
    avg = perf.sum() / n
    rew_ent = np.exp((ent_np - 1.0) / 0.3)
    if task == "CONTINUOUS_JUMPING_FORWARD3":
        expect = 0.8 * (avg * 0.15 * 1.0 + avg * 0.4 * (6.0 / td.max_ep_len)
                        + avg * rew_ent * 0.2 + avg * 0.25) \
            + 0.2 * perf.max() + 0.1 * int((perf >= td.performance_bound).sum()) \
            + 0.2 * avg
    else:
        expect = avg * rew_ent
    assert abs(r - expect) < 5e-3, (r, expect)


def test_over_capacity_episode_stays_exact_and_unclobbered():
    """140 jumps > MAX_JUMPS=128: streaming stats stay exact, the buffer
    keeps the FIRST 128 jumps (recording stops, nothing is overwritten),
    and the rewards stay finite."""
    td = T.get_task("CONTINUOUS_JUMPING_FORWARD3")
    ts, dxs, zmaxs = _run_cycles(td, 141, np.random.default_rng(1))
    jd, jh, perf = _expected(td, dxs, zmaxs)
    n = len(jd)
    assert n == 140 and n > T.MAX_JUMPS

    assert int(ts.jump_counter) == n
    # exact streaming statistics at any count
    assert abs(float(ts.perf_sum) - perf.sum()) < 1e-3
    assert abs(float(T._avg_performance(ts)) - perf.sum() / n) < 1e-5
    assert abs(float(ts.max_perf) - perf.max()) < 1e-5
    assert abs(float(ts.last_perf) - perf[-1]) < 1e-5
    assert int(ts.good_jump_counter) == int(
        (perf >= td.performance_bound).sum())
    # buffer: first MAX_JUMPS jumps, unclobbered (slot -1 holds jump #128,
    # not jump #140)
    np.testing.assert_allclose(np.asarray(ts.fwd_array), jd[:T.MAX_JUMPS],
                               atol=1e-5)
    ent = float(T._entropy_fwd(ts))
    assert np.isfinite(ent) and 0.0 < ent <= 1.05
    ctx_end = _ctx([float(np.sum(dxs)), 0.0, 0.30], [0, 0, 0], False, 6.0)
    assert np.isfinite(float(T.task_reward_end(td, ts, ctx_end)))

    # host-side KPI extraction is self-consistent
    stats = T.continuous_jump_stats(ts)
    assert stats["n_jumps"] == n
    assert stats["n_jumps_recorded"] == T.MAX_JUMPS
    assert len(stats["per_jump_fwd_m"]) == T.MAX_JUMPS
    assert abs(stats["mean_perf"] - perf.mean()) < 1e-3
