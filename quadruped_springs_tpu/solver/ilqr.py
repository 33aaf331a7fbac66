"""iLQR trajectory optimizer — batched, jit/vmap/shard_map-native.

The solver at the heart of the TPU-native framework (BASELINE.json): the
reference trains policies externally with SB3 PPO/ARS; here the same tasks
are solved as trajectory optimization — dynamics = the 100 Hz control-rate
step of the analytic Go1 model (10 × 1 kHz substeps), controls = policy
actions in [-1,1]^d, costs = the task reward surfaces recast as costs
(tasks/costs.py).

Design notes (TPU-first):
  * Linearization: A_t (n×n), B_t (n×m) via `jax.jacfwd` of the step fn,
    vmapped over the horizon — one big batched Jacobian evaluation instead
    of a sequential sweep; XLA fuses the 37-dim chain rule onto the VPU.
  * Backward Riccati recursion: `lax.scan` over the horizon with
    Levenberg-Marquardt regularization on Q_uu.
  * Forward pass: a *parallel* line search — all candidate step sizes α are
    rolled out simultaneously under `vmap`, the argmin cost is selected.
    This trades FLOPs for wall-clock, the right trade on a TPU.
  * Everything is fixed-iteration (`lax.scan`) so thousands of solves batch
    with `vmap` and shard over a mesh with `shard_map` (parallel/).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from flax import struct


@dataclasses.dataclass(frozen=True)
class ILQRConfig:
    horizon: int = 50
    iterations: int = 10
    n_alphas: int = 8           # parallel line-search candidates
    reg_init: float = 1.0
    reg_min: float = 1e-6
    reg_max: float = 1e8
    reg_factor: float = 2.0
    u_min: float = -1.0
    u_max: float = 1.0
    # Per-knot PD shift for Q_uu: "gershgorin" (cheap elementwise lower
    # bound on λ_min — the TPU default: eigvalsh lowers to an iterative
    # eigensolver that costs ~2.5x the whole backward scan) or "eig"
    # (exact shift by the most negative eigenvalue).
    pd_shift: str = "gershgorin"
    # Regularization: "control" (plain LM shift on Q_uu — cheaper, and
    # measurably less conservative on the jump tasks: −37.6 final cost /
    # 0.70 m apex vs −33.2 / 0.54 m for "tassa" at H=25, 8 iters) or
    # "tassa" (state-space: μ through the dynamics; keep available for
    # problems where Vxx blows up and bounded gains matter more).
    reg_mode: str = "control"
    # Riccati sweep: "sequential" (lax.scan, per-knot adaptive LM + Tassa
    # state regularization — the robust default) or "parallel"
    # (associative-scan parallel-in-time LQT à la Särkkä & García-Fernández
    # 2021 — O(log H) depth, the framework's sequence parallelism; uses a
    # control-cost LM shift instead of the per-knot adaptive one).
    backward: str = "sequential"
    # Relinearize the dynamics every k-th iteration (lagged Gauss-Newton):
    # the 43-tangent Jacobian sweep dominates iteration FLOPs, and near
    # convergence A/B barely change — k=2 re-uses them on odd iterations
    # (cost gradients are always fresh). k=1 = exact classic iLQR.
    relin_every: int = 1
    # lax.scan unroll factor for the backward/forward sweeps: the per-step
    # bodies are tiny batched matmuls, so TPU scan-iteration overhead is
    # material; unrolling amortizes it at some compile-time cost.
    unroll: int = 1


def _parallel_lqt_backward(A, B, lx, lu, lxx, luu, lux, VxT, VxxT, reg):
    """Parallel-in-time Riccati via jax.lax.associative_scan (O(log H) depth).

    Solves the per-iteration LQ subproblem
        min Σ ½δxᵀlxx δx + lxᵀδx + ½δuᵀluu δu + luᵀδu + δuᵀlux δx + terminal
        s.t. δx' = A δx + B δu
    by composing conditional-value-function elements (a, b, C, η, J)
    (Särkkä & García-Fernández 2021, "Temporal parallelization of dynamic
    programming and linear quadratic control"). Cross terms are removed by
    the change of variables u = v − luuʳ⁻¹(lux δx + lu); regularization is
    an LM shift on the control Hessian (reg + Gershgorin(luu)).

    Returns (ks (H,m), Ks (H,m,n), dV=0, ok).
    """
    H, n, m = A.shape[0], A.shape[1], B.shape[2]
    eye_m = jnp.eye(m, dtype=A.dtype)
    eye_n = jnp.eye(n, dtype=A.dtype)

    # regularized control Hessian (PD by Gershgorin shift)
    offdiag = (jnp.sum(jnp.abs(luu), axis=-1)
               - jnp.abs(jnp.diagonal(luu, axis1=-2, axis2=-1)))
    gersh = jnp.min(jnp.diagonal(luu, axis1=-2, axis2=-1) - offdiag, axis=-1)
    mu = reg + jnp.maximum(-gersh, 0.0) + 1e-6
    R = luu + mu[:, None, None] * eye_m

    Rinv_N = jnp.linalg.solve(R, lux)               # (H, m, n)
    Rinv_r = jnp.linalg.solve(R, lu[..., None])[..., 0]  # (H, m)
    At = A - jnp.einsum("hab,hbc->hac", B, Rinv_N)  # Ã = A − B R⁻¹ N
    ct = -jnp.einsum("hab,hb->ha", B, Rinv_r)       # c̃ = −B R⁻¹ r
    Qt = lxx - jnp.einsum("hca,hcb->hab", lux, Rinv_N)   # Q̃ = Q − NᵀR⁻¹N
    qt = lx - jnp.einsum("hca,hc->ha", lux, Rinv_r)      # q̃ = q − NᵀR⁻¹r
    # C = B R⁻¹ Bᵀ computed stably via the solve
    RinvBt = jnp.linalg.solve(R, B.swapaxes(-1, -2))     # (H, m, n)
    Ct = jnp.einsum("hab,hbc->hac", B, RinvBt)           # (H, n, n)

    # elements for steps 0..H-1 plus the terminal element
    a_el = jnp.concatenate([At, jnp.zeros((1, n, n), A.dtype)], axis=0)
    b_el = jnp.concatenate([ct, jnp.zeros((1, n), A.dtype)], axis=0)
    C_el = jnp.concatenate([Ct, jnp.zeros((1, n, n), A.dtype)], axis=0)
    eta_el = jnp.concatenate([-qt, -VxT[None]], axis=0)
    J_el = jnp.concatenate([Qt, VxxT[None]], axis=0)

    def combine(e_later, e_earlier):
        """Compose element i = e_earlier (covers [k,l)) with j = e_later
        (covers [l,r)). Note the argument order: with reverse=True,
        associative_scan flips the sequence and runs a forward scan, so the
        accumulated LATER block arrives first."""
        Ai, bi, Ci, etai, Ji = e_earlier
        Aj, bj, Cj, etaj, Jj = e_later
        I_CJ = eye_n + jnp.einsum("...ab,...bc->...ac", Ci, Jj)
        # X = (I + C_i J_j)⁻¹, applied from the left
        AjX = jnp.einsum(
            "...ab,...bc->...ac", Aj,
            jnp.linalg.solve(I_CJ, jnp.broadcast_to(eye_n, I_CJ.shape)))
        I_JC = eye_n + jnp.einsum("...ab,...bc->...ac", Jj, Ci)
        AiT_Y = jnp.einsum(
            "...ba,...bc->...ac", Ai,
            jnp.linalg.solve(I_JC, jnp.broadcast_to(eye_n, I_JC.shape)))
        A_new = jnp.einsum("...ab,...bc->...ac", AjX, Ai)
        b_new = jnp.einsum("...ab,...b->...a", AjX,
                           bi + jnp.einsum("...ab,...b->...a", Ci, etaj)) + bj
        C_new = jnp.einsum("...ab,...bc,...dc->...ad", AjX, Ci, Aj) + Cj
        eta_new = jnp.einsum(
            "...ab,...b->...a", AiT_Y,
            etaj - jnp.einsum("...ab,...b->...a", Jj, bi)) + etai
        J_new = jnp.einsum("...ab,...bc,...cd->...ad", AiT_Y, Jj, Ai) + Ji
        return (A_new, b_new, C_new, eta_new, J_new)

    # reverse associative scan: element at index k composes [k..T]
    elems = (a_el, b_el, C_el, eta_el, J_el)
    composed = jax.lax.associative_scan(combine, elems, reverse=True)
    S = composed[4]          # (H+1, n, n): value Hessians S_k
    eta = composed[3]        # (H+1, n):    value linear terms s_k = −η_k
    s_lin = -eta

    # per-knot gains from S_{k+1}, s_{k+1}, all in the ORIGINAL (u, A)
    # coordinates — the deviation dynamics have no affine term, so
    # Qu = lu + Bᵀs', Qux = lux + BᵀS'A, Quu = R + BᵀS'B. All parallel.
    S1, s1 = S[1:], s_lin[1:]
    Quu = R + jnp.einsum("hba,hbc,hcd->had", B, S1, B)
    rhs_k = jnp.einsum("hba,hb->ha", B, s1) + lu
    rhs_K = jnp.einsum("hba,hbc,hcd->had", B, S1, A) + lux
    sol = jnp.linalg.solve(Quu, jnp.concatenate([rhs_k[..., None], rhs_K],
                                                axis=-1))
    ks = -sol[..., 0]
    Ks = -sol[..., 1:]
    ok = jnp.all(jnp.isfinite(ks)) & jnp.all(jnp.isfinite(Ks))
    dV = jnp.asarray(0.0, A.dtype)
    return ks, Ks, dV, ok


@struct.dataclass
class ILQRSolution:
    us: jnp.ndarray         # (H, m) optimal controls
    xs: jnp.ndarray         # (H+1, n) state trajectory
    cost: jnp.ndarray       # () final cost
    cost_trace: jnp.ndarray # (iterations,) cost per iteration
    reg: jnp.ndarray        # () final regularization


def _total_cost(stage_cost, terminal_cost, xs, us):
    ts = jnp.arange(us.shape[0])
    stage = jnp.sum(jax.vmap(stage_cost)(xs[:-1], us, ts))
    return stage + terminal_cost(xs[-1])


def solve(dynamics: Callable, stage_cost: Callable, terminal_cost: Callable,
          x0: jnp.ndarray, u_init: jnp.ndarray,
          config: ILQRConfig = ILQRConfig()) -> ILQRSolution:
    """Minimize  Σ_t l(x_t, u_t, t) + lf(x_H)  s.t.  x_{t+1} = f(x_t, u_t).

    Args:
      dynamics: f(x, u) -> x'   (n,), (m,) -> (n,)
      stage_cost: l(x, u, t) -> scalar
      terminal_cost: lf(x) -> scalar
      x0: (n,) initial state.
      u_init: (H, m) warm-start controls (CPG / demo warm starts plug here).
    """
    H, m = u_init.shape
    n = x0.shape[0]
    clip_u = lambda u: jnp.clip(u, config.u_min, config.u_max)

    def rollout(us):
        def f(x, u):
            x2 = dynamics(x, clip_u(u))
            return x2, x2
        _, xs_tail = jax.lax.scan(f, x0, us)
        return jnp.concatenate([x0[None], xs_tail], axis=0)

    # One fused forward-mode sweep for ALL derivatives: seed n+m tangents
    # through a joint (dynamics, grad-of-cost) evaluation so XLA shares the
    # primal dynamics work across A, B, l_xx, l_uu, l_ux — instead of six
    # separate jacfwd/hessian passes re-evaluating the model.
    def _dyn_and_cost_grad(z, t):
        x, u = z[:n], z[n:]
        xp = dynamics(x, u)
        gx, gu = jax.grad(stage_cost, argnums=(0, 1))(x, u, t)
        return xp, jnp.concatenate([gx, gu])

    jac_all = jax.vmap(jax.jacfwd(_dyn_and_cost_grad, argnums=0))
    l_grads = jax.vmap(jax.grad(stage_cost, argnums=(0, 1)))

    def _cost_grad_z(z, t):
        gx, gu = jax.grad(stage_cost, argnums=(0, 1))(z[:n], z[n:], t)
        return jnp.concatenate([gx, gu])

    jac_dyn_only = jax.vmap(jax.jacfwd(
        lambda z: dynamics(z[:n], z[n:])))
    jac_cost_only = jax.vmap(jax.jacfwd(_cost_grad_z, argnums=0))

    def linearize_dyn(xs, us):
        zs = jnp.concatenate([xs[:-1], us], axis=-1)
        J = jac_dyn_only(zs)
        return J[:, :, :n], J[:, :, n:]

    def backward(xs, us, reg, AB=None):
        ts = jnp.arange(H)
        zs = jnp.concatenate([xs[:-1], us], axis=-1)     # (H, n+m)
        if AB is None:
            # fused sweep: dynamics Jacobian + cost Hessian share primals
            J_dyn, J_lag = jac_all(zs, ts)
            A = J_dyn[:, :, :n]                  # (H, n, n)
            B = J_dyn[:, :, n:]                  # (H, n, m)
        else:
            # lagged Gauss-Newton: stale A/B, fresh cost derivatives
            A, B = AB
            J_lag = jac_cost_only(zs, ts)
        lxx = J_lag[:, :n, :n]
        lux = J_lag[:, n:, :n]
        luu = J_lag[:, n:, n:]
        lx, lu = l_grads(xs[:-1], us, ts)
        Vx = jax.grad(terminal_cost)(xs[-1])
        Vxx = jax.hessian(terminal_cost)(xs[-1])

        if config.backward == "parallel":
            return _parallel_lqt_backward(A, B, lx, lu, lxx, luu, lux,
                                          Vx, Vxx, reg)

        # Numerical safety rails for f32 Riccati through stiff contact:
        # value-function clamps keep the recursion inside float range; the
        # line search rejects any step the clamps distorted into ascent.
        V_CLAMP = 1e7

        def bstep(carry, inp):
            Vx, Vxx, dV, ok = carry
            A_t, B_t, lx_t, lu_t, lxx_t, luu_t, lux_t = inp
            Qx = lx_t + A_t.T @ Vx
            Qu = lu_t + B_t.T @ Vx
            Qxx = lxx_t + A_t.T @ Vxx @ A_t
            Quu = luu_t + B_t.T @ Vxx @ B_t
            Qux = lux_t + B_t.T @ Vxx @ A_t
            if config.reg_mode == "tassa":
                # Tassa-style state regularization: μ acting through the
                # dynamics keeps the feedback gains K bounded when Vxx is
                # large.
                Vxx_r = Vxx + reg * jnp.eye(Vxx.shape[0], dtype=us.dtype)
                Quu_r = luu_t + B_t.T @ Vxx_r @ B_t
                Qux_r = lux_t + B_t.T @ Vxx_r @ A_t
            else:
                # plain control-space LM: shift Quu directly (saves the
                # duplicated B'VB / B'VA products; often less conservative)
                Quu_r = Quu
                Qux_r = Qux
            # per-knot adaptive Levenberg-Marquardt: shift so Quu_reg is
            # always PD — fixed compute (no retry loop), essential because
            # the value function goes indefinite through contact/clip
            # nonconvexities. Gershgorin gives λ_min ≥ min_i(a_ii − Σ|a_ij|)
            # with pure elementwise ops; "eig" shifts by the exact most
            # negative eigenvalue.
            if config.pd_shift == "eig":
                lam_min = jnp.linalg.eigvalsh(Quu_r)[0]
            else:
                offdiag = (jnp.sum(jnp.abs(Quu_r), axis=1)
                           - jnp.abs(jnp.diagonal(Quu_r)))
                lam_min = jnp.min(jnp.diagonal(Quu_r) - offdiag)
            mu_t = reg + jnp.maximum(-lam_min, 0.0) + 1e-6
            Quu_reg = Quu_r + mu_t * jnp.eye(m, dtype=us.dtype)
            L, lower = jax.scipy.linalg.cho_factor(Quu_reg)
            diag_ok = jnp.all(jnp.isfinite(L))
            k = -jax.scipy.linalg.cho_solve((L, lower), Qu)
            K = -jax.scipy.linalg.cho_solve((L, lower), Qux_r)
            Vx2 = Qx + K.T @ Quu @ k + K.T @ Qu + Qux.T @ k
            Vxx2 = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx2 = 0.5 * (Vxx2 + Vxx2.T)
            Vx2 = jnp.clip(Vx2, -V_CLAMP, V_CLAMP)
            Vxx2 = jnp.clip(Vxx2, -V_CLAMP, V_CLAMP)
            dV2 = dV + jnp.dot(k, Qu) + 0.5 * k @ Quu @ k
            return (Vx2, Vxx2, dV2, ok & diag_ok), (k, K)

        init = (Vx, Vxx, jnp.asarray(0.0, us.dtype), jnp.asarray(True))
        (Vx, Vxx, dV, ok), (ks, Ks) = jax.lax.scan(
            bstep, init, (A, B, lx, lu, lxx, luu, lux), reverse=True,
            unroll=config.unroll)
        return ks, Ks, dV, ok

    def forward(xs, us, ks, Ks, alpha):
        def fstep(x, inp):
            x_ref, u_ref, k, K = inp
            u = clip_u(u_ref + alpha * k + K @ (x - x_ref))
            x2 = dynamics(x, u)
            return x2, (x2, u)
        _, (xs_tail, us_new) = jax.lax.scan(fstep, x0, (xs[:-1], us, ks, Ks),
                                            unroll=config.unroll)
        xs_new = jnp.concatenate([x0[None], xs_tail], axis=0)
        cost = _total_cost(stage_cost, terminal_cost, xs_new, us_new)
        return xs_new, us_new, cost

    alphas = 1.1 ** (-jnp.arange(config.n_alphas, dtype=x0.dtype) ** 2)

    def _accept(xs, us, cost, reg, ks, Ks, ok):
        xs_c, us_c, costs = jax.vmap(lambda a: forward(xs, us, ks, Ks, a))(alphas)
        best = jnp.argmin(costs)
        new_cost = costs[best]
        improved = ok & (new_cost < cost) & jnp.isfinite(new_cost)
        xs2 = jnp.where(improved, xs_c[best], xs)
        us2 = jnp.where(improved, us_c[best], us)
        cost2 = jnp.where(improved, new_cost, cost)
        reg2 = jnp.where(
            improved,
            jnp.maximum(reg / config.reg_factor, config.reg_min),
            jnp.minimum(reg * config.reg_factor * config.reg_factor, config.reg_max),
        )
        return xs2, us2, cost2, reg2

    def iteration(carry, _):
        xs, us, cost, reg = carry
        ks, Ks, dV, ok = backward(xs, us, reg)
        xs2, us2, cost2, reg2 = _accept(xs, us, cost, reg, ks, Ks, ok)
        return (xs2, us2, cost2, reg2), cost2

    def iteration_lagged(carry, i):
        xs, us, cost, reg, lin = carry
        lin = jax.lax.cond(
            (i % config.relin_every) == 0,
            lambda: linearize_dyn(xs, us), lambda: lin)
        ks, Ks, dV, ok = backward(xs, us, reg, AB=lin)
        xs2, us2, cost2, reg2 = _accept(xs, us, cost, reg, ks, Ks, ok)
        return (xs2, us2, cost2, reg2, lin), cost2

    us0 = clip_u(u_init)
    xs0 = rollout(us0)
    cost0 = _total_cost(stage_cost, terminal_cost, xs0, us0)
    reg0 = jnp.asarray(config.reg_init, x0.dtype)
    if config.relin_every <= 1:
        (xs, us, cost, reg), trace = jax.lax.scan(
            iteration, (xs0, us0, cost0, reg0), None,
            length=config.iterations)
    else:
        lin0 = (jnp.zeros((H, n, n), x0.dtype),
                jnp.zeros((H, n, m), x0.dtype))
        (xs, us, cost, reg, _), trace = jax.lax.scan(
            iteration_lagged, (xs0, us0, cost0, reg0, lin0),
            jnp.arange(config.iterations))
    return ILQRSolution(us=us, xs=xs, cost=cost, cost_trace=trace, reg=reg)
