"""Policy / value networks for the native trainers.

The reference trains externally with stable-baselines3 PPO and sb3-contrib
ARS (README.md:44, load_model.py:124). Here the equivalents are flax
modules: an MLP actor-critic for PPO and a linear policy for ARS (ARS's
canonical policy class).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLPPolicy(nn.Module):
    """Tanh-squashed diagonal-Gaussian actor + value head (SB3 PPO default
    is a 64-64 MLP; actions are clipped to [-1,1] by the env interface)."""
    action_dim: int
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs):
        # towers carry pi_/vf_ name scopes so stage transitions can copy
        # the actor and re-initialize the critic (PPOTrainer.warm_start):
        # warm-starting fine-tune with a critic fitted to a DIFFERENT
        # reward scale floods the shared optimizer with value-loss
        # gradient and collapses the imitated policy.
        x = obs
        for i, h in enumerate(self.hidden):
            x = nn.tanh(nn.Dense(h, name=f"pi_{i}")(x))
        mean = nn.Dense(self.action_dim, name="pi_out")(x)
        log_std = self.param("log_std", nn.initializers.constant(-0.5),
                             (self.action_dim,))
        v = obs
        for i, h in enumerate(self.hidden):
            v = nn.tanh(nn.Dense(h, name=f"vf_{i}")(v))
        value = nn.Dense(1, name="vf_out")(v)[..., 0]
        return mean, log_std, value


def linear_policy_init(obs_dim: int, action_dim: int) -> jnp.ndarray:
    """ARS linear policy: a = W obs_norm; params = W (action_dim, obs_dim)."""
    return jnp.zeros((action_dim, obs_dim), jnp.float32)


def linear_policy_apply(W: jnp.ndarray, obs: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(W @ obs, -1.0, 1.0)


def sample_action(params, apply_fn, obs, key, deterministic=False):
    mean, log_std, value = apply_fn(params, obs)
    if deterministic:
        a = mean
        logp = jnp.zeros(mean.shape[:-1])
    else:
        eps = jax.random.normal(key, mean.shape)
        a = mean + jnp.exp(log_std) * eps
        logp = gaussian_logp(a, mean, log_std)
    return jnp.clip(a, -1.0, 1.0), logp, value


def gaussian_logp(a, mean, log_std):
    var = jnp.exp(2 * log_std)
    return jnp.sum(
        -0.5 * ((a - mean) ** 2 / var + 2 * log_std + jnp.log(2 * jnp.pi)),
        axis=-1)
