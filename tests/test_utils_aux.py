"""Aux subsystem tests: profiling timers, sanitizers, cameras, timer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_springs_tpu.utils import profiling, sanitize
from quadruped_springs_tpu.utils.camera import CAMERA_MODES, make_camera
from quadruped_springs_tpu.utils import timer as tm


def test_time_fn_and_throughput():
    f = jax.jit(lambda x: x * 2.0)
    dt = profiling.time_fn(f, jnp.ones(8))
    assert dt > 0
    out = profiling.solve_throughput(f, 8, jnp.ones(8))
    assert out["solves_per_second"] > 0


def test_annotate_scope_runs():
    with profiling.annotate("phase"):
        jax.block_until_ready(jnp.ones(4) + 1)


def test_checked_flags_nan():
    def f(x):
        return jnp.log(x)
    err, _ = sanitize.checked(f)(jnp.array(-1.0))
    with pytest.raises(Exception):
        err.throw()
    err, _ = sanitize.checked(f)(jnp.array(2.0))
    err.throw()  # no error on clean input


def test_finite_mask():
    tree = {"a": jnp.array([[1.0, 2.0], [jnp.nan, 1.0], [3.0, 4.0]]),
            "b": jnp.array([1.0, 2.0, jnp.inf])}
    mask = sanitize.finite_mask(tree)
    assert mask.tolist() == [True, False, False]


def test_assert_finite_raises():
    with pytest.raises(FloatingPointError):
        sanitize.assert_finite(jnp.array([1.0, jnp.nan]))
    sanitize.assert_finite(jnp.array([1.0, 2.0]))


def test_camera_modes_produce_tracks():
    t = np.linspace(0, 2, 40)
    base = np.stack([t, 0 * t, 0.3 + 0.2 * np.sin(t)], axis=-1)
    for mode in CAMERA_MODES:
        track = make_camera(mode, base)
        eye = track.eye()
        assert eye.shape == (40, 3)
        assert np.all(np.isfinite(eye))
    with pytest.raises(KeyError):
        make_camera("BOGUS", base)


def test_timer_countdown():
    t = tm.timer_init()
    assert not bool(tm.time_up(t, 0.0))
    t = tm.start_timer(t, now=1.0, duration=0.5)
    assert not bool(tm.time_up(t, 1.4))
    assert bool(tm.time_up(t, 1.5))
    assert not bool(tm.time_up(tm.reset_timer(t), 99.0))
