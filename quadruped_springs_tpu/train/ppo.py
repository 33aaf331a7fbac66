"""PPO — the reference's stage-2 trainer (SB3 PPO), native in JAX/optax.

Clipped-surrogate PPO with GAE, tanh-Gaussian MLP policy, running obs
normalization, minibatched epochs — the learner step is one jitted program
so the whole (rollout → advantage → epochs of minibatch updates) pipeline
stays on-device; batch envs vmap, and the env axis can shard over the mesh.

Used for the imitate-then-finetune stage of the two-stage methodology
(load_model.py:45-47: ARS → demonstrations → PPO imitation → PPO finetune):
point it at a *_DEMO task for imitation or a *_PPO task for finetuning.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import optax
from flax import struct

from quadruped_springs_tpu.env.env import QuadrupedEnv
from quadruped_springs_tpu.train import normalize as vnorm
from quadruped_springs_tpu.train import rollout as ro
from quadruped_springs_tpu.train.networks import MLPPolicy, gaussian_logp


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    n_envs: int = 32
    segment_len: int = 64
    n_epochs: int = 4
    n_minibatches: int = 4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    lr: float = 3e-4
    vf_coef: float = 0.5
    ent_coef: float = 0.0
    max_grad_norm: float = 0.5
    reset_bank_size: int = 32
    hidden: tuple = (64, 64)
    # SB3 target_kl analog: when > 0, minibatch updates are masked out
    # (params frozen) for the rest of the train_step once the running
    # approx_kl exceeds this — the brake that keeps fine-tuning from
    # stepping a warm-started policy off a cliff.
    kl_stop: float = 0.0
    # Critic-warmup mode for stage transitions: train ONLY the value head
    # (policy gradient and entropy terms zeroed). A fresh critic's huge
    # value error otherwise makes the first GAE advantages garbage, and
    # the policy steps taken on them are what start eroding a warm-started
    # jumper before the trust region can help.
    freeze_actor: bool = False
    # Freeze the running observation statistics (VecNormalize training=False,
    # load_model.py:114-117). Essential when warm-starting from a
    # BC/imitation policy: its obs stats carry a count of ~one demo
    # (~100 samples), so a single 2048-sample on-policy update rescales the
    # policy's inputs by ~95% — the policy network is a function of the
    # NORMALIZED obs, so the behavior collapses with the weights untouched
    # (measured: warm-started apex 0.54 -> 0.14 within 9 iterations purely
    # from statistics drift, scripts/diag_finetune.py).
    freeze_obs_norm: bool = False
    # Temporal correlation of the exploration noise: eps_t = rho*eps_{t-1}
    # + sqrt(1-rho^2)*nu_t (AR(1); 0 = white). The reference trains RL
    # through a 3 Hz Butterworth action filter (quadruped_gym_env.py:129,
    # motion-imitation lineage) which low-passes the exploration noise as
    # well as the mean; our demos already record the FILTERED mean signal,
    # so re-filtering at execution double-lags the launch — the filter's
    # remaining role, smoothing exploration, is provided by correlated
    # noise instead (rho=0.9 at 100 Hz ~ the same 3 Hz bandwidth). The
    # per-step MARGINAL stays N(mean, sigma), so the stored logp is exact
    # per step and approximate only jointly (the standard gSDE-style
    # treatment). Measured: white noise crashes the precision landing of a
    # warm-started jumper in ~half the rollouts and PPO unlearns the jump
    # within 9 iterations; see scripts/diag_e2e_v2.py.
    noise_rho: float = 0.0
    # Anchored polish (trust region to a FIXED prior policy): adds
    # anchor_coef * mean((mu(s) - mu_anchor(s))^2) over rollout states to
    # the loss, with the anchor passed to train_step via
    # PPOTrainer.set_anchor(). Rationale (scripts/diag_imitate_r4.py): a
    # BC-initialized policy sits at the imitation reward's ceiling, so
    # the surrogate gradient is ~pure noise — and Adam's step size is
    # lr-scaled regardless of gradient magnitude, so 16 minibatch
    # updates/iter random-walk the parameters ~0.1 per 60 iters at any
    # lr; the closed-loop launch is sensitive enough that this wander
    # alone collapses the probe apex 0.98 -> 0.1-0.5 in EVERY
    # unanchored configuration measured (arms A-H). The per-update
    # kl_stop bounds single-step drift, not the cumulative walk; only an
    # anchor to the initializer does. Improvements must then earn their
    # distance from the prior through the reward — the standard
    # KL-to-prior treatment for fine-tuning from a pretrained policy.
    anchor_coef: float = 0.0
    # BC-anchored polish: adds bc_coef * mse(mu(demo_obs), demo_actions)
    # over the FIXED demo dataset (set via PPOTrainer.set_bc_anchor) to
    # every minibatch update. Measured necessity
    # (scripts/diag_imitate_r4.py arms P/Q/R): a rollout-state anchor
    # fails because launch states are ~1/demo_len of the batch, so the
    # quadratic anchor's restoring force on them is diluted ~185x at
    # real demo scale while the Adam noise drive isn't — the demo-set
    # anchor weights every demo row (launch included) uniformly. This is
    # the BC objective kept live through the polish: PPO may adapt
    # off-demo states (robustness) but cannot walk the demonstrated
    # state->action mapping away.
    bc_coef: float = 0.0


@struct.dataclass
class PPOState:
    params: dict
    opt_state: optax.OptState
    obs_norm: vnorm.RunningNorm
    env_states: object           # batched EnvState
    obs: jnp.ndarray             # (n_envs, obs_dim)
    bank: tuple                  # (bank_states, bank_obs)
    key: jax.Array
    iteration: jnp.ndarray


class PPOTrainer:
    def __init__(self, env: QuadrupedEnv, config: PPOConfig = PPOConfig(),
                 demo=None):
        """`demo` (optional demo-library array): build the reset bank with
        reference-state initialization (rollout.make_rsi_bank) — the
        reference composes the RSI wrapper into the imitation stack
        (load_model.py:45-47 methodology)."""
        self.env = env
        self.config = config
        self.demo = demo
        self.net = MLPPolicy(env.action_dim, config.hidden)
        self.anchor_params = None   # set_anchor() — see PPOConfig.anchor_coef
        self.bc_anchor = None       # set_bc_anchor() — see PPOConfig.bc_coef
        self.tx = optax.chain(
            optax.clip_by_global_norm(config.max_grad_norm),
            optax.adam(config.lr))

    def set_anchor(self, params):
        """Fix the anchor policy for PPOConfig.anchor_coef > 0 (typically
        the BC initializer). Stored on the trainer (static under jit):
        call BEFORE the first train_step."""
        self.anchor_params = jax.tree.map(jax.lax.stop_gradient, params)

    def set_bc_anchor(self, obs_n, actions):
        """Fix the demo dataset for PPOConfig.bc_coef > 0: obs must be
        pre-normalized with the (frozen) stage obs statistics. Call
        BEFORE the first train_step."""
        self.bc_anchor = (jnp.asarray(obs_n), jnp.asarray(actions))

    def init(self, key: jax.Array) -> PPOState:
        cfg = self.config
        k_param, k_bank, k_env, key = jax.random.split(key, 4)
        params = self.net.init(k_param, jnp.zeros(self.env.obs_dim))
        if self.demo is not None:
            bank = ro.make_rsi_bank(self.env, self.demo, k_bank,
                                    cfg.reset_bank_size)
        else:
            bank = ro.make_reset_bank(self.env, k_bank, cfg.reset_bank_size)
        idx = jax.random.randint(k_env, (cfg.n_envs,), 0, cfg.reset_bank_size)
        env_states = jax.tree.map(lambda a: a[idx], bank[0])
        obs = bank[1][idx]
        return PPOState(
            params=params,
            opt_state=self.tx.init(params),
            obs_norm=vnorm.RunningNorm.create(self.env.obs_dim),
            env_states=env_states,
            obs=obs,
            bank=bank,
            key=key,
            iteration=jnp.asarray(0, jnp.int32),
        )

    def warm_start(self, ts: PPOState, src_params, src_obs_norm,
                   key: jax.Array, reset_value: bool = True,
                   log_std: float | None = None) -> PPOState:
        """Stage-transition warm start (imitation -> fine-tune): copy the
        ACTOR tower (+ running obs stats) from the source stage, but
        re-initialize the CRITIC — the source critic is fitted to a
        different reward scale, and its huge initial value error otherwise
        dominates the shared update and collapses the policy (the failure
        mode the round-2 run committed: eval apex 0.57 m -> 0.001 m).
        `log_std` optionally re-opens exploration (imitation typically
        anneals it shut). Optimizer state restarts fresh."""
        fresh = self.net.init(key, jnp.zeros(self.env.obs_dim))
        p = {k: (v if (reset_value and k.startswith("vf_"))
                 else jax.tree.map(jnp.asarray, src_params["params"][k]))
             for k, v in fresh["params"].items()}
        if log_std is not None:
            p["log_std"] = jnp.full_like(p["log_std"], log_std)
        params = {"params": p}
        return ts.replace(params=params, opt_state=self.tx.init(params),
                          obs_norm=src_obs_norm)

    def _action_fn(self, params, obs_norm):
        rho = self.config.noise_rho

        def fn(obs, key, eps_prev):
            o = vnorm.normalize(obs_norm, obs)
            mean, log_std, value = self.net.apply(params, o)
            nu = jax.random.normal(key, mean.shape)
            # AR(1)-correlated exploration (see PPOConfig.noise_rho);
            # rho=0 reduces to white noise. Marginal of eps stays N(0, 1).
            eps = rho * eps_prev + jnp.sqrt(1.0 - rho * rho) * nu
            # store the UNCLIPPED sample; the rollout clips what the env
            # executes (SB3 semantics). Computing logp at the clipped
            # action makes the surrogate reward pushing the mean OUTWARD
            # to exploit clipping's variance reduction — measured here as
            # deterministic eval degrading while train reward creeps up.
            a = mean + jnp.exp(log_std) * eps
            return a, gaussian_logp(a, mean, log_std), value, eps
        return fn

    def _gae(self, traj, last_value):
        cfg = self.config
        rewards, values, dones = traj["reward"], traj["value"], traj["done"]
        values_tp1 = jnp.concatenate([values[1:], last_value[None]], axis=0)
        not_done = 1.0 - dones.astype(jnp.float32)
        deltas = rewards + cfg.gamma * values_tp1 * not_done - values

        def back(carry, inp):
            delta, nd = inp
            adv = delta + cfg.gamma * cfg.gae_lambda * nd * carry
            return adv, adv

        _, advs = jax.lax.scan(back, jnp.zeros_like(last_value),
                               (deltas, not_done), reverse=True)
        return advs, advs + values

    def _loss(self, params, batch):
        cfg = self.config
        mean, log_std, value = self.net.apply(params, batch["obs_n"])
        logp = gaussian_logp(batch["action"], mean, log_std)
        ratio = jnp.exp(logp - batch["logp"])
        # pg_mask (see rollout.segment_rollout): policy-gradient and KL
        # terms count only knots where the policy's action was executed —
        # on autopilot knots (env/continuous_autopilot.py) the stored logp
        # belongs to an unexecuted action. All-ones for plain envs, where
        # every weighted statistic below reduces to the unweighted one.
        m = batch["pg_mask"].astype(jnp.float32)
        msum = jnp.maximum(jnp.sum(m), 1.0)
        adv = batch["adv"]
        a_mean = jnp.sum(adv * m) / msum
        a_std = jnp.sqrt(jnp.maximum(
            jnp.sum((adv - a_mean) ** 2 * m) / msum, 0.0))
        adv = (adv - a_mean) / (a_std + 1e-8)
        pg = -jnp.sum(jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv) * m
        ) / msum
        vf = 0.5 * jnp.mean((value - batch["ret"]) ** 2)
        ent = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
        logratio = logp - batch["logp"]
        # non-negative KL estimator (Schulman's k3, what SB3's target_kl
        # early stop thresholds on)
        kl_est = jnp.sum((jnp.exp(logratio) - 1.0 - logratio) * m) / msum
        pg_coef = 0.0 if cfg.freeze_actor else 1.0
        anchor = jnp.asarray(0.0)
        if cfg.anchor_coef > 0.0 and self.anchor_params is not None:
            mean_a, _, _ = self.net.apply(self.anchor_params, batch["obs_n"])
            anchor = jnp.mean((mean - mean_a) ** 2)
        bc_mse = jnp.asarray(0.0)
        if cfg.bc_coef > 0.0 and self.bc_anchor is not None:
            bo, ba = self.bc_anchor
            bc_mean, _, _ = self.net.apply(params, bo)
            bc_mse = jnp.mean((bc_mean - ba) ** 2)
        return (pg_coef * (pg - cfg.ent_coef * ent) + cfg.vf_coef * vf
                + cfg.anchor_coef * anchor + cfg.bc_coef * bc_mse), \
            {"pg_loss": pg, "vf_loss": vf, "anchor_mse": anchor,
             "bc_mse": bc_mse,
             "approx_kl": jnp.sum((batch["logp"] - logp) * m) / msum,
             "kl_est": kl_est}

    @partial(jax.jit, static_argnums=0)
    def train_step(self, ts: PPOState):
        cfg = self.config
        key, k_roll, k_perm = jax.random.split(ts.key, 3)

        env_states, obs, traj = ro.segment_rollout(
            self.env, self._action_fn(ts.params, ts.obs_norm),
            ts.env_states, ts.obs, ts.bank, k_roll, cfg.segment_len)

        if cfg.freeze_obs_norm:
            obs_norm = ts.obs_norm
        else:
            obs_flat = traj["obs"].reshape(-1, self.env.obs_dim)
            obs_norm = vnorm.update(ts.obs_norm, obs_flat)

        o_last = vnorm.normalize(ts.obs_norm, obs)
        _, _, last_value = self.net.apply(ts.params, o_last)
        advs, rets = self._gae(traj, last_value)

        batch = {
            "obs_n": vnorm.normalize(ts.obs_norm, traj["obs"]).reshape(
                -1, self.env.obs_dim),
            "action": traj["action"].reshape(-1, self.env.action_dim),
            "logp": traj["logp"].reshape(-1),
            "adv": advs.reshape(-1),
            "ret": rets.reshape(-1),
            "pg_mask": traj["pg_mask"].reshape(-1),
        }
        n = batch["logp"].shape[0]
        mb = n // cfg.n_minibatches

        def epoch(carry, k):
            params, opt_state, halted = carry
            perm = jax.random.permutation(k, n)
            shuf = jax.tree.map(lambda a: a[perm], batch)

            def minibatch(carry, i):
                params, opt_state, halted = carry
                sl = jax.tree.map(
                    lambda a: jax.lax.dynamic_slice_in_dim(a, i * mb, mb), shuf)
                (loss, aux), grads = jax.value_and_grad(
                    self._loss, has_aux=True)(params, sl)
                updates, opt_state2 = self.tx.update(grads, opt_state, params)
                params2 = optax.apply_updates(params, updates)
                # kl_stop: once the policy has drifted past the trust
                # region, freeze — both branches trace, the masked select
                # keeps the scan jit-able (SB3 target_kl early stop)
                if cfg.kl_stop > 0.0:
                    halted = halted | (aux["kl_est"] > cfg.kl_stop)
                    keep = lambda new, old: jax.tree.map(
                        lambda a, b: jnp.where(halted, b, a), new, old)
                    params2 = keep(params2, params)
                    opt_state2 = keep(opt_state2, opt_state)
                return (params2, opt_state2, halted), (loss, aux)

            (params, opt_state, halted), (losses, auxs) = jax.lax.scan(
                minibatch, (params, opt_state, halted),
                jnp.arange(cfg.n_minibatches))
            return (params, opt_state, halted), (losses, auxs)

        keys = jax.random.split(k_perm, cfg.n_epochs)
        (params, opt_state, _), (losses, auxs) = jax.lax.scan(
            epoch, (ts.params, ts.opt_state, jnp.asarray(False)), keys)

        metrics = {
            "loss": jnp.mean(losses),
            "anchor_mse": jnp.mean(auxs["anchor_mse"]),
            "bc_mse": jnp.mean(auxs["bc_mse"]),
            "pg_loss": jnp.mean(auxs["pg_loss"]),
            "vf_loss": jnp.mean(auxs["vf_loss"]),
            "approx_kl": jnp.mean(auxs["approx_kl"]),
            "kl_est": jnp.mean(auxs["kl_est"]),
            "mean_reward": jnp.mean(traj["reward"]),
            "episode_rate": jnp.mean(traj["done"].astype(jnp.float32)),
        }
        return ts.replace(
            params=params, opt_state=opt_state, obs_norm=obs_norm,
            env_states=env_states, obs=obs, key=key,
            iteration=ts.iteration + 1), metrics

    @partial(jax.jit, static_argnums=(0, 2, 3))
    def evaluate(self, ts: PPOState, n_episodes: int = 8,
                 max_steps: int = 200):
        key = jax.random.fold_in(ts.key, 321)
        states, obs = ro.make_reset_bank(self.env, key, n_episodes)

        def policy(obs):
            o = vnorm.normalize(ts.obs_norm, obs)
            mean, _, _ = self.net.apply(ts.params, o)
            return jnp.clip(mean, -1.0, 1.0)

        rets, info = ro.episode_returns(self.env, policy, states, obs, max_steps)
        return {"return_mean": jnp.mean(rets), "return_std": jnp.std(rets),
                "max_height": jnp.max(info["max_height"]),
                "max_fwd": jnp.max(info["max_fwd"])}
