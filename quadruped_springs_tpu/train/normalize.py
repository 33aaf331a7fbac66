"""Running observation normalization — the VecNormalize equivalent.

The reference's eval path loads SB3 VecNormalize statistics
(load_model.py:114-117: obs normalized by running mean/var, training=False
at eval). Here the statistics are an explicit pytree updated with Welford
batch merges, so normalization works inside jit/vmap and is trivially
checkpointable.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningNorm:
    mean: jnp.ndarray
    var: jnp.ndarray
    count: jnp.ndarray  # ()

    @classmethod
    def create(cls, dim: int):
        return cls(mean=jnp.zeros(dim), var=jnp.ones(dim),
                   count=jnp.asarray(1e-4, jnp.float32))


def update(rn: RunningNorm, batch: jnp.ndarray) -> RunningNorm:
    """Merge a (N, d) batch of observations (parallel Welford)."""
    n = jnp.asarray(batch.shape[0], jnp.float32)
    b_mean = jnp.mean(batch, axis=0)
    b_var = jnp.var(batch, axis=0)
    delta = b_mean - rn.mean
    tot = rn.count + n
    mean = rn.mean + delta * n / tot
    m_a = rn.var * rn.count
    m_b = b_var * n
    var = (m_a + m_b + delta**2 * rn.count * n / tot) / tot
    return RunningNorm(mean=mean, var=var, count=tot)


def update_from_moments(rn: RunningNorm, count, total,
                        total_sq) -> RunningNorm:
    """Merge raw moment sums (count (), total (d,), total_sq (d,)) — for
    streams accumulated inside a scan (rollout observations) where stacking
    the batch is wasteful."""
    n = jnp.maximum(count, 1e-8)
    b_mean = total / n
    b_var = jnp.maximum(total_sq / n - b_mean**2, 0.0)
    delta = b_mean - rn.mean
    tot = rn.count + count
    mean = rn.mean + delta * count / tot
    var = (rn.var * rn.count + b_var * count
           + delta**2 * rn.count * count / tot) / tot
    return RunningNorm(mean=mean, var=var, count=tot)


def normalize(rn: RunningNorm, obs: jnp.ndarray, clip: float = 10.0):
    return jnp.clip((obs - rn.mean) / jnp.sqrt(rn.var + 1e-8), -clip, clip)
