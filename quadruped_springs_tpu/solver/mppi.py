"""MPPI (model-predictive path integral) solver — sampling-based MPC.

Complement to the gradient-based iLQR (solver/ilqr.py): no linearization,
no backward recursion — each iteration rolls K perturbed control sequences
forward and re-weights them by exponentiated cost (information-theoretic
MPC, Williams et al. 2017). This maps perfectly onto TPU: the K×B rollout
batch is one big lane-parallel scan, and the non-smooth pieces that hurt
Newton-type methods (one-sided springs, torque clips, stiff contact) cost
nothing here. NOTE: by default MPCProblem.solve_mppi plans on the SAME
relaxed planner model as iLQR (coarse substeps, soft contact — see
MPCConfig); to plan on the execution-rate stiff dynamics, build the
problem with MPCConfig.full_rate(...) — sampling tolerates it (no
linearization to overflow), it just costs ~5x more sequential substeps.

Shares the dynamics/cost plumbing of MPCProblem (solver/mpc.py); see
MPCProblem.solve_mppi.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct


@dataclasses.dataclass(frozen=True)
class MPPIConfig:
    horizon: int = 50
    iterations: int = 10
    n_samples: int = 64          # K rollouts per iteration
    sigma: float = 0.3           # exploration std in action units
    sigma_decay: float = 0.93    # annealing: σ_i = σ·decay^i (coarse→fine)
    temperature: float = 0.05    # λ: softmax sharpness over costs
    smooth: bool = True          # time-correlated (integrated) noise
    elite_frac: float = 0.5      # weights computed over the best half only
    u_min: float = -1.0
    u_max: float = 1.0
    # dtype for the K SAMPLE rollouts only ("f32"/"bf16"): candidate
    # scoring tolerates reduced precision; the updated sequence's
    # accept/reject evaluation and the returned trajectory always use the
    # exact f32 dynamics (see solve(dynamics_sample=...)).
    sample_dtype: str = "f32"
    # Fold the accept/reject rollout into the NEXT iteration's candidate
    # batch (candidate 0 = the unperturbed proposal): halves the solver's
    # sequential depth — per iteration one K-wide rollout instead of a
    # K-wide rollout THEN a width-1 accept rollout of the same depth.
    # Sequential substeps, not FLOPs, dominate TPU solve latency (the
    # K-axis is lane-parallel), so this is ~2x on the execution-rate
    # model. Semantics change (disclosed): the running best sequence is
    # tracked under the SAMPLE dynamics costs, and the best-vs-proposal
    # choice is settled by ONE exact-dynamics evaluation of each after
    # the loop instead of per-iteration exact accept tests.
    fused_accept: bool = False


@struct.dataclass
class MPPISolution:
    us: jnp.ndarray          # (H, m) updated control sequence
    xs: jnp.ndarray          # (H+1, n) rollout of us
    cost: jnp.ndarray        # () cost of us
    cost_trace: jnp.ndarray  # (iterations,)


def _total_cost(stage_cost, terminal_cost, xs, us):
    ts = jnp.arange(us.shape[0])
    return (jnp.sum(jax.vmap(stage_cost)(xs[:-1], us, ts))
            + terminal_cost(xs[-1]))


def solve(dynamics: Callable, stage_cost: Callable, terminal_cost: Callable,
          x0: jnp.ndarray, u_init: jnp.ndarray, key: jax.Array,
          config: MPPIConfig = MPPIConfig(),
          dynamics_sample: Callable | None = None) -> MPPISolution:
    """Minimize Σ l(x,u,t) + lf(x_H) by iterated importance-weighted sampling.

    Args mirror ilqr.solve plus an explicit PRNG key (MPPI is stochastic).
    `dynamics_sample` (optional, e.g. a bfloat16-cast model) is used for
    the K candidate rollouts only; the accepted sequence is always
    re-evaluated with the exact `dynamics`.
    """
    H, m = u_init.shape
    clip_u = lambda u: jnp.clip(u, config.u_min, config.u_max)
    K = config.n_samples
    n_elite = max(int(K * config.elite_frac), 1)

    def _rollout_with(dyn_fn, us):
        def f(x, u):
            x2 = dyn_fn(x, u)
            return x2, x2
        _, xs_tail = jax.lax.scan(f, x0, us)
        xs = jnp.concatenate([x0[None], xs_tail], axis=0)
        return xs, _total_cost(stage_cost, terminal_cost, xs, us)

    def rollout(us):
        return _rollout_with(dynamics, us)

    def rollout_sample(us):
        return _rollout_with(dynamics_sample or dynamics, us)

    def iteration(carry, inp):
        k, sigma_i = inp
        us, cost = carry
        eps = sigma_i * jax.random.normal(k, (K, H, m), us.dtype)
        if config.smooth:
            # first-order low-pass along time: correlated exploration keeps
            # sampled torque profiles physically plausible (the reference
            # filters policy actions with a 3 Hz Butterworth for the same
            # reason, utils/action_filter.py).
            a, b = 0.7, 0.3
            def lp(c, e):
                c2 = a * c + b * e
                return c2, c2
            _, eps = jax.lax.scan(lp, jnp.zeros((K, m), us.dtype),
                                  jnp.swapaxes(eps, 0, 1))
            # Exact per-timestep renormalization: Var(c_t) = b²(1-a^{2(t+1)})
            # /(1-a²)·σ², so dividing by its sqrt restores marginal std σ_i
            # at EVERY horizon step (a fixed steady-state factor under-
            # restores early steps before the filter converges).
            t = jnp.arange(H, dtype=us.dtype)
            norm = b * jnp.sqrt((1.0 - a ** (2.0 * (t + 1.0))) / (1.0 - a * a))
            eps = jnp.swapaxes(eps, 0, 1) / norm[None, :, None]
        cand = clip_u(us[None] + eps)
        _, costs = jax.vmap(rollout_sample)(cand)
        costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
        # elite-truncated importance weights (robust to diverged samples)
        kth = jnp.sort(costs)[n_elite - 1]
        beta = jnp.min(costs)
        w = jnp.exp(-(costs - beta) / config.temperature)
        w = jnp.where(costs <= kth, w, 0.0)
        w = w / jnp.maximum(jnp.sum(w), 1e-12)
        us_new = clip_u(jnp.einsum("k,khm->hm", w, cand))
        _, cost_new = rollout(us_new)
        better = cost_new < cost
        us2 = jnp.where(better, us_new, us)
        cost2 = jnp.where(better, cost_new, cost)
        return (us2, cost2), cost2

    def iteration_fused(carry, inp):
        """One K-wide sample rollout per iteration, no separate accept
        rollout: candidate 0 is the unperturbed proposal (eps row 0 = 0),
        so its sample-dynamics cost doubles as the deferred accept test of
        the previous iteration's softmax update. The running best
        (us_best, cost_best) is argmin over every candidate ever scored."""
        k, sigma_i = inp
        us_prop, us_best, cost_best = carry
        eps = sigma_i * jax.random.normal(k, (K, H, m), us_prop.dtype)
        if config.smooth:
            a, b = 0.7, 0.3
            def lp(c, e):
                c2 = a * c + b * e
                return c2, c2
            _, eps = jax.lax.scan(lp, jnp.zeros((K, m), us_prop.dtype),
                                  jnp.swapaxes(eps, 0, 1))
            t = jnp.arange(H, dtype=us_prop.dtype)
            norm = b * jnp.sqrt((1.0 - a ** (2.0 * (t + 1.0)))
                                / (1.0 - a * a))
            eps = jnp.swapaxes(eps, 0, 1) / norm[None, :, None]
        eps = eps.at[0].set(0.0)
        cand = clip_u(us_prop[None] + eps)
        _, costs = jax.vmap(rollout_sample)(cand)
        costs = jnp.where(jnp.isfinite(costs), costs, jnp.inf)
        ib = jnp.argmin(costs)
        better = costs[ib] < cost_best
        us_best2 = jnp.where(better, cand[ib], us_best)
        cost_best2 = jnp.where(better, costs[ib], cost_best)
        kth = jnp.sort(costs)[n_elite - 1]
        beta = jnp.min(costs)
        w = jnp.exp(-(costs - beta) / config.temperature)
        w = jnp.where(costs <= kth, w, 0.0)
        w = w / jnp.maximum(jnp.sum(w), 1e-12)
        us_new = clip_u(jnp.einsum("k,khm->hm", w, cand))
        return (us_new, us_best2, cost_best2), cost_best2

    us0 = clip_u(u_init)
    keys = jax.random.split(key, config.iterations)
    sigmas = config.sigma * config.sigma_decay ** jnp.arange(
        config.iterations, dtype=x0.dtype)
    if config.fused_accept:
        (us_prop, us_best, _), trace = jax.lax.scan(
            iteration_fused, (us0, us0, jnp.asarray(jnp.inf, x0.dtype)),
            (keys, sigmas))
        # settle proposal-vs-best with the exact dynamics (2 rollouts once,
        # instead of `iterations` exact accept rollouts)
        xs_p, cost_p = rollout(us_prop)
        xs_b, cost_b = rollout(us_best)
        take_b = cost_b < cost_p
        us = jnp.where(take_b, us_best, us_prop)
        xs = jnp.where(take_b, xs_b, xs_p)
        cost = jnp.where(take_b, cost_b, cost_p)
        return MPPISolution(us=us, xs=xs, cost=cost, cost_trace=trace)
    xs0, cost0 = rollout(us0)
    (us, cost), trace = jax.lax.scan(iteration, (us0, cost0), (keys, sigmas))
    xs, _ = rollout(us)
    return MPPISolution(us=us, xs=xs, cost=cost, cost_trace=trace)
