"""ARS — Augmented Random Search, the reference's stage-1 trainer.

The reference trains jumping policies with sb3-contrib ARS through the
rl-baselines3-zoo fork (README.md:44, load_model.py "ars" branch). This is
the native TPU equivalent: ARS-v2 (obs-normalized, top-b direction
averaging) with every perturbation rollout batched in one vmapped scan —
2·n_directions full episodes evaluated per learner step in a single XLA
program; the scenario/direction axis shards over the device mesh.

Reference algorithm: Mania, Guy, Recht (2018), "Simple random search
provides a competitive approach to reinforcement learning".
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from quadruped_springs_tpu.env.env import QuadrupedEnv
from quadruped_springs_tpu.train import normalize as vnorm
from quadruped_springs_tpu.train import rollout as ro
from quadruped_springs_tpu.train.networks import linear_policy_apply


@dataclasses.dataclass(frozen=True)
class ARSConfig:
    n_directions: int = 16
    top_directions: int = 8
    step_size: float = 0.02
    delta_std: float = 0.025
    episode_steps: int = 200      # 100 Hz control steps (2 s episodes)
    reset_bank_size: int = 16
    # Trainer-driven curriculum (env_randomizer_base.py:83-93): the level
    # rises by `curriculum_increase` per learner iteration (clipped to 1),
    # and the reset bank samples scenarios at the current level — so the
    # domain-randomization ranges widen as training advances.
    curriculum_increase: float = 0.0
    # Warm-started fine-tunes must NOT refresh the observation statistics:
    # the policy is W(normalize(obs)), so rescaling the inputs under a
    # behavior-cloned W changes the behavior with the weights untouched
    # (the PPO fine-tune collapse root cause — same VecNormalize
    # training=False semantics as PPOConfig.freeze_obs_norm).
    freeze_obs_norm: bool = False


@struct.dataclass
class ARSState:
    W: jnp.ndarray                # (action_dim, obs_dim)
    obs_norm: vnorm.RunningNorm
    key: jax.Array
    iteration: jnp.ndarray        # () int32
    curriculum_level: jnp.ndarray  # () float32 in [0,1]


class ARSTrainer:
    def __init__(self, env: QuadrupedEnv, config: ARSConfig = ARSConfig()):
        self.env = env
        self.config = config
        # sparse tasks pay their reward at episode END — if episodes can't
        # finish inside the rollout horizon, every return is zero and ARS
        # has no signal. Loud foot-gun warning (the reference runs full
        # 10 s episodes through SB3's episodic VecEnv, so it can't hit
        # this).
        ep_horizon_s = config.episode_steps * env.env_time_step
        if env.config.max_ep_len > ep_horizon_s:
            import warnings
            warnings.warn(
                f"ARS episode_steps={config.episode_steps} "
                f"({ep_horizon_s:.2f} s) is shorter than the env timeout "
                f"max_ep_len={env.config.max_ep_len} s: episodes that "
                "survive never terminate inside the rollout, so sparse "
                "terminal rewards are never paid (all-zero returns). "
                "Lower max_ep_len or raise episode_steps.")

    def init(self, key: jax.Array) -> ARSState:
        return ARSState(
            W=jnp.zeros((self.env.action_dim, self.env.obs_dim)),
            obs_norm=vnorm.RunningNorm.create(self.env.obs_dim),
            key=key,
            iteration=jnp.asarray(0, jnp.int32),
            curriculum_level=jnp.asarray(
                self.env.config.curriculum_level, jnp.float32),
        )

    def increase_curriculum_level(self, ts: ARSState, value) -> ARSState:
        """Manual level bump mirroring quadruped_gym_env.py:423-425 (the
        reference trainer calls this as training advances); the automatic
        path is ARSConfig.curriculum_increase."""
        return ts.replace(curriculum_level=jnp.clip(
            ts.curriculum_level + value, 0.0, 1.0))

    def _policy(self, W, obs_norm):
        def fn(obs):
            return jax.vmap(linear_policy_apply, in_axes=(None, 0))(
                W, vnorm.normalize(obs_norm, obs))
        return fn

    @partial(jax.jit, static_argnums=0)
    def train_step(self, ts: ARSState):
        cfg = self.config
        key, k_delta, k_bank = jax.random.split(ts.key, 3)
        deltas = jax.random.normal(
            k_delta, (cfg.n_directions,) + ts.W.shape) * cfg.delta_std

        bank_states, bank_obs = ro.make_reset_bank(
            self.env, k_bank, cfg.reset_bank_size,
            curriculum_level=ts.curriculum_level)

        def eval_W(W):
            # one episode per reset-bank entry; mean return + obs moments
            rets, info = ro.episode_returns(
                self.env, self._policy(W, ts.obs_norm),
                bank_states, bank_obs, cfg.episode_steps)
            return jnp.mean(rets), (info["obs_count"], info["obs_sum"],
                                    info["obs_sumsq"])

        r_plus, mom_p = jax.vmap(lambda d: eval_W(ts.W + d))(deltas)
        r_minus, mom_m = jax.vmap(lambda d: eval_W(ts.W - d))(deltas)

        # top-b directions by max(r+, r-)
        score = jnp.maximum(r_plus, r_minus)
        order = jnp.argsort(-score)[: cfg.top_directions]
        rp, rm, ds = r_plus[order], r_minus[order], deltas[order]
        sigma = jnp.std(jnp.concatenate([rp, rm])) + 1e-8
        update = jnp.einsum("d,dij->ij", rp - rm, ds) / (
            cfg.top_directions * sigma)
        W = ts.W + cfg.step_size / cfg.delta_std * update

        # refresh obs statistics from ALL rollout observations of this
        # iteration (flight phases included) — SB3 ARS normalizes with the
        # full rollout stream, not reset-pose obs only.
        oc = jnp.sum(mom_p[0]) + jnp.sum(mom_m[0])
        osum = jnp.sum(mom_p[1], axis=0) + jnp.sum(mom_m[1], axis=0)
        osq = jnp.sum(mom_p[2], axis=0) + jnp.sum(mom_m[2], axis=0)
        if cfg.freeze_obs_norm:
            obs_norm = ts.obs_norm
        else:
            obs_norm = vnorm.update_from_moments(ts.obs_norm, oc, osum, osq)

        metrics = {
            "mean_return": jnp.mean(jnp.concatenate([r_plus, r_minus])),
            "best_return": jnp.max(score),
            "sigma_r": sigma,
            "curriculum_level": ts.curriculum_level,
        }
        return ts.replace(
            W=W, obs_norm=obs_norm, key=key, iteration=ts.iteration + 1,
            curriculum_level=jnp.clip(
                ts.curriculum_level + cfg.curriculum_increase, 0.0, 1.0),
        ), metrics

    @partial(jax.jit, static_argnums=(0, 2))
    def evaluate(self, ts: ARSState, n_episodes: int = 8):
        key = jax.random.fold_in(ts.key, 123)
        states, obs = ro.make_reset_bank(self.env, key, n_episodes)
        rets, info = ro.episode_returns(
            self.env, self._policy(ts.W, ts.obs_norm), states, obs,
            self.config.episode_steps)
        return {"return_mean": jnp.mean(rets), "return_std": jnp.std(rets),
                "max_height": jnp.max(info["max_height"]),
                "max_fwd": jnp.max(info["max_fwd"])}
