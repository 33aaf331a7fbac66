"""Sim-time countdown timer — functional equivalent of utils/timer.py:1-48.

The reference Timer is a mutable object the landing wrappers use to wait
until the jump apex (start_timer(timer_time=vz/g), time_up()). Here it is
an immutable pytree + pure transitions, usable inside jit/scan/while_loop
(the landing wrappers in env/wrappers.py inline this arithmetic; the class
is provided for API parity and external control code).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Timer:
    start_time: jnp.ndarray   # () sim seconds
    end_time: jnp.ndarray     # ()
    running: jnp.ndarray      # () bool


def timer_init() -> Timer:
    z = jnp.asarray(0.0, jnp.float32)
    return Timer(start_time=z, end_time=z, running=jnp.asarray(False))


def start_timer(t: Timer, now, duration) -> Timer:
    """Arm the countdown at sim time `now` for `duration` seconds."""
    now = jnp.asarray(now, jnp.float32)
    return Timer(start_time=now,
                 end_time=now + jnp.asarray(duration, jnp.float32),
                 running=jnp.asarray(True))


def time_up(t: Timer, now) -> jnp.ndarray:
    """True once the armed countdown has elapsed."""
    return t.running & (jnp.asarray(now, jnp.float32) >= t.end_time)


def reset_timer(t: Timer) -> Timer:
    return timer_init()
