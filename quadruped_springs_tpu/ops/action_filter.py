"""Butterworth action low-pass filter as a pure JAX linear recurrence.

Equivalent of the reference's ActionFilterButter (utils/action_filter.py:
41-213; Google motion-imitation lineage): order-2 lowpass, 3 Hz cutoff at
the 100 Hz control rate, per-joint state, history initialized to the first
action after reset. The IIR update

    a0 y[n] = b0 x[n] + b1 x[n-1] + b2 x[n-2] - a1 y[n-1] - a2 y[n-2]

is carried as an explicit (2, d) state pytree so it jits, vmaps over
scenario batches, and scans over rollouts.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from flax import struct
from scipy.signal import butter

ACTION_FILTER_ORDER = 2
ACTION_FILTER_HIGH_CUT = 3.0  # Hz


@struct.dataclass
class ButterFilterState:
    xhist: jnp.ndarray  # (order, d), index 0 = newest
    yhist: jnp.ndarray  # (order, d)


@struct.dataclass
class ButterFilterCoeffs:
    b: jnp.ndarray  # (order+1,)
    a: jnp.ndarray  # (order+1,), a[0] normalized to 1


def butter_coeffs(sampling_rate: float, highcut: float = ACTION_FILTER_HIGH_CUT,
                  order: int = ACTION_FILTER_ORDER) -> ButterFilterCoeffs:
    b, a = butter(order, highcut / (0.5 * sampling_rate), btype="low")
    b = np.asarray(b) / a[0]
    a = np.asarray(a) / a[0]
    return ButterFilterCoeffs(b=jnp.asarray(b, jnp.float32), a=jnp.asarray(a, jnp.float32))


def filter_reset(dim: int, init_action=None, dtype=jnp.float32) -> ButterFilterState:
    """Zero history, or history primed with the first action
    (ActionFilter.init_history, action_filter.py:123-127)."""
    if init_action is None:
        h = jnp.zeros((ACTION_FILTER_ORDER, dim), dtype)
        return ButterFilterState(xhist=h, yhist=h)
    init = jnp.broadcast_to(init_action, (ACTION_FILTER_ORDER, dim)).astype(dtype)
    return ButterFilterState(xhist=init, yhist=init)


def filter_step(coeffs: ButterFilterCoeffs, state: ButterFilterState, x):
    """One filter step; returns (new_state, y)."""
    y = (
        coeffs.b[0] * x
        + jnp.einsum("k,kd->d", coeffs.b[1:], state.xhist)
        - jnp.einsum("k,kd->d", coeffs.a[1:], state.yhist)
    )
    new = ButterFilterState(
        xhist=jnp.concatenate([x[None], state.xhist[:-1]], axis=0),
        yhist=jnp.concatenate([y[None], state.yhist[:-1]], axis=0),
    )
    return new, y
