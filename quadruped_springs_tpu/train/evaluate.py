"""Evaluation harness — the load_model.py equivalent.

The reference eval flow (load_model.py:66-138): read env kwargs from the
rl-zoo args.yml, rebuild the wrapped env, load VecNormalize stats + the SB3
model zip, roll deterministic episodes. Here the artifact is a checkpoint
of the native trainer state (params + obs-norm + env config), and rollouts
are jitted/batched.
"""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp

from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.train import normalize as vnorm
from quadruped_springs_tpu.train import rollout as ro
from quadruped_springs_tpu.train.networks import MLPPolicy, linear_policy_apply
from quadruped_springs_tpu.utils import checkpoint as ckpt


def save_experiment(path: str, env_config: EnvConfig, algo: str,
                    train_state) -> None:
    """Persist env kwargs (the args.yml role) + trainer state."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump({"algo": algo, "env": dataclasses.asdict(env_config)}, f,
                  indent=2)
    ckpt.save(os.path.join(path, "state"), _policy_artifact(algo, train_state))


def _policy_artifact(algo: str, ts):
    if algo == "ars":
        return {"W": ts.W, "obs_norm": ts.obs_norm}
    return {"params": ts.params, "obs_norm": ts.obs_norm}


def load_experiment(path: str):
    """Rebuild (env, deterministic policy_fn) from a saved experiment."""
    with open(os.path.join(path, "config.json")) as f:
        meta = json.load(f)
    env = QuadrupedEnv(EnvConfig(**meta["env"]))
    algo = meta["algo"]
    if algo == "ars":
        template = {
            "W": jnp.zeros((env.action_dim, env.obs_dim)),
            "obs_norm": vnorm.RunningNorm.create(env.obs_dim),
        }
        art = ckpt.restore(os.path.join(path, "state"), template)

        def policy(obs):
            o = vnorm.normalize(art["obs_norm"], obs)
            return jax.vmap(linear_policy_apply, in_axes=(None, 0))(art["W"], o)
    else:
        net = MLPPolicy(env.action_dim)
        params0 = net.init(jax.random.PRNGKey(0), jnp.zeros(env.obs_dim))
        template = {"params": params0,
                    "obs_norm": vnorm.RunningNorm.create(env.obs_dim)}
        art = ckpt.restore(os.path.join(path, "state"), template)

        def policy(obs):
            o = vnorm.normalize(art["obs_norm"], obs)
            mean, _, _ = net.apply(art["params"], o)
            return jnp.clip(mean, -1.0, 1.0)

    return env, policy


def evaluate_policy(env: QuadrupedEnv, policy, key: jax.Array,
                    n_episodes: int = 8, max_steps: int = 1000):
    """Deterministic batched evaluation (the load_model.py __main__ loop)."""
    states, obs = ro.make_reset_bank(env, key, n_episodes)
    rets, info = ro.episode_returns(env, policy, states, obs, max_steps)
    return {
        "return_mean": float(jnp.mean(rets)),
        "return_std": float(jnp.std(rets)),
        "episode_len_mean": float(jnp.mean(info["length"])),
        "max_height": float(jnp.max(info["max_height"])),
        "max_fwd": float(jnp.max(info["max_fwd"])),
    }
