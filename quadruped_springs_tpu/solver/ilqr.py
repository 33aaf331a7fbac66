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


def lqt_elements(A, B, lx, lu, lxx, luu, lux, VxT, VxxT, reg):
    """Conditional-value-function elements of the LQ subproblem (Särkkä &
    García-Fernández 2021): per-knot tuples (a, b, C, η, J) for steps
    0..H-1 plus the terminal element. Cross terms are removed by the
    change of variables u = v − R⁻¹(lux δx + lu); regularization is an LM
    shift on the control Hessian (reg + Gershgorin(luu)).

    Returns (elems (5 arrays, leading dim H+1), R (H,m,m))."""
    n = A.shape[1]
    m = B.shape[2]
    eye_m = jnp.eye(m, dtype=A.dtype)

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

    a_el = jnp.concatenate([At, jnp.zeros((1, n, n), A.dtype)], axis=0)
    b_el = jnp.concatenate([ct, jnp.zeros((1, n), A.dtype)], axis=0)
    C_el = jnp.concatenate([Ct, jnp.zeros((1, n, n), A.dtype)], axis=0)
    eta_el = jnp.concatenate([-qt, -VxT[None]], axis=0)
    J_el = jnp.concatenate([Qt, VxxT[None]], axis=0)
    return (a_el, b_el, C_el, eta_el, J_el), R


def lqt_identity_element(n, dtype, batch_shape=()):
    """Neutral element of lqt_combine (covers an empty interval)."""
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), batch_shape + (n, n))
    z_nn = jnp.zeros(batch_shape + (n, n), dtype)
    z_n = jnp.zeros(batch_shape + (n,), dtype)
    return (eye, z_n, z_nn, z_n, z_nn)


def lqt_combine(e_later, e_earlier):
    """Compose element i = e_earlier (covers [k,l)) with j = e_later
    (covers [l,r)). Note the argument order: with reverse=True,
    associative_scan flips the sequence and runs a forward scan, so the
    accumulated LATER block arrives first."""
    Ai, bi, Ci, etai, Ji = e_earlier
    Aj, bj, Cj, etaj, Jj = e_later
    n = Ai.shape[-1]
    eye_n = jnp.eye(n, dtype=Ai.dtype)
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


def lqt_gains(S1, s1, A, B, R, lu, lux):
    """Per-knot gains from the NEXT knot's value function (S_{k+1},
    s_{k+1}), in the ORIGINAL (u, A) coordinates — the deviation dynamics
    have no affine term, so Qu = lu + Bᵀs', Qux = lux + BᵀS'A,
    Quu = R + BᵀS'B. All knots in parallel."""
    Quu = R + jnp.einsum("hba,hbc,hcd->had", B, S1, B)
    rhs_k = jnp.einsum("hba,hb->ha", B, s1) + lu
    rhs_K = jnp.einsum("hba,hbc,hcd->had", B, S1, A) + lux
    sol = jnp.linalg.solve(Quu, jnp.concatenate([rhs_k[..., None], rhs_K],
                                                axis=-1))
    ks = -sol[..., 0]
    Ks = -sol[..., 1:]
    return ks, Ks


def _parallel_lqt_backward(A, B, lx, lu, lxx, luu, lux, VxT, VxxT, reg):
    """Parallel-in-time Riccati via jax.lax.associative_scan (O(log H)
    depth) within one device. The device-sharded variant (time axis over
    the mesh with ICI collectives) lives in parallel/riccati.py.

    Returns (ks (H,m), Ks (H,m,n), dV=0, ok).
    """
    elems, R = lqt_elements(A, B, lx, lu, lxx, luu, lux, VxT, VxxT, reg)
    # reverse associative scan: element at index k composes [k..T]
    composed = jax.lax.associative_scan(lqt_combine, elems, reverse=True)
    S = composed[4]          # (H+1, n, n): value Hessians S_k
    s_lin = -composed[3]     # (H+1, n):    value linear terms

    ks, Ks = lqt_gains(S[1:], s_lin[1:], A, B, R, lu, lux)
    ok = jnp.all(jnp.isfinite(ks)) & jnp.all(jnp.isfinite(Ks))
    dV = jnp.asarray(0.0, A.dtype)
    return ks, Ks, dV, ok


def riccati_sequential(A, B, lx, lu, lxx, luu, lux, Vx, Vxx, reg,
                       config: ILQRConfig):
    """The sequential backward Riccati sweep for ONE problem instance
    (extracted so solve and solve_batched share it; solve_batched vmaps
    it over the batch axis). See the inline notes in `solve`."""
    H, n, m = A.shape[0], A.shape[1], B.shape[2]
    V_CLAMP = 1e7
    dtype = A.dtype

    def bstep(carry, inp):
        Vx, Vxx, dV, ok = carry
        A_t, B_t, lx_t, lu_t, lxx_t, luu_t, lux_t = inp
        Qx = lx_t + A_t.T @ Vx
        Qu = lu_t + B_t.T @ Vx
        Qxx = lxx_t + A_t.T @ Vxx @ A_t
        Quu = luu_t + B_t.T @ Vxx @ B_t
        Qux = lux_t + B_t.T @ Vxx @ A_t
        if config.reg_mode == "tassa":
            Vxx_r = Vxx + reg * jnp.eye(n, dtype=dtype)
            Quu_r = luu_t + B_t.T @ Vxx_r @ B_t
            Qux_r = lux_t + B_t.T @ Vxx_r @ A_t
        else:
            Quu_r = Quu
            Qux_r = Qux
        if config.pd_shift == "eig":
            lam_min = jnp.linalg.eigvalsh(Quu_r)[0]
        else:
            offdiag = (jnp.sum(jnp.abs(Quu_r), axis=1)
                       - jnp.abs(jnp.diagonal(Quu_r)))
            lam_min = jnp.min(jnp.diagonal(Quu_r) - offdiag)
        mu_t = reg + jnp.maximum(-lam_min, 0.0) + 1e-6
        Quu_reg = Quu_r + mu_t * jnp.eye(m, dtype=dtype)
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

    init = (Vx, Vxx, jnp.asarray(0.0, dtype), jnp.asarray(True))
    (_, _, dV, ok), (ks, Ks) = jax.lax.scan(
        bstep, init, (A, B, lx, lu, lxx, luu, lux), reverse=True,
        unroll=config.unroll)
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
          config: ILQRConfig = ILQRConfig(),
          dynamics_lin: Callable | None = None) -> ILQRSolution:
    """Minimize  Σ_t l(x_t, u_t, t) + lf(x_H)  s.t.  x_{t+1} = f(x_t, u_t).

    Args:
      dynamics: f(x, u) -> x'   (n,), (m,) -> (n,)
      stage_cost: l(x, u, t) -> scalar
      terminal_cost: lf(x) -> scalar
      x0: (n,) initial state.
      u_init: (H, m) warm-start controls (CPG / demo warm starts plug here).
      dynamics_lin: optional cheaper dynamics used ONLY for the A/B
        Jacobian sweep (e.g. a bfloat16-cast model — the 43-tangent
        linearization dominates iteration FLOPs, and Gauss-Newton
        tolerates ~0.4%-relative A/B error). Rollouts, cost ranking, and
        the Riccati recursion always use the exact f32 `dynamics`.
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

    dyn_for_jac = dynamics_lin if dynamics_lin is not None else dynamics
    jac_dyn_only = jax.vmap(jax.jacfwd(
        lambda z: dyn_for_jac(z[:n], z[n:])))
    jac_cost_only = jax.vmap(jax.jacfwd(_cost_grad_z, argnums=0))

    def linearize_dyn(xs, us):
        zs = jnp.concatenate([xs[:-1], us], axis=-1)
        J = jac_dyn_only(zs).astype(x0.dtype)
        return J[:, :, :n], J[:, :, n:]

    def backward(xs, us, reg, AB=None):
        ts = jnp.arange(H)
        zs = jnp.concatenate([xs[:-1], us], axis=-1)     # (H, n+m)
        if AB is None and dynamics_lin is None:
            # fused sweep: dynamics Jacobian + cost Hessian share primals
            J_dyn, J_lag = jac_all(zs, ts)
            A = J_dyn[:, :, :n]                  # (H, n, n)
            B = J_dyn[:, :, n:]                  # (H, n, m)
        else:
            # stale A/B (lagged Gauss-Newton) or reduced-precision A/B —
            # either way cost derivatives are fresh and exact
            A, B = AB if AB is not None else linearize_dyn(xs, us)
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

        # Sequential sweep: per-knot adaptive LM (Gershgorin PD shift) and
        # f32 safety clamps — see riccati_sequential.
        return riccati_sequential(A, B, lx, lu, lxx, luu, lux, Vx, Vxx,
                                  reg, config)

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


def solve_batched(dynamics_b: Callable, stage_cost: Callable,
                  terminal_cost: Callable, x0s: jnp.ndarray,
                  u_inits: jnp.ndarray,
                  config: ILQRConfig = ILQRConfig(),
                  dynamics_lin_b: Callable | None = None) -> ILQRSolution:
    """Batch-explicit iLQR — same algorithm as vmap(solve), restructured
    for TPU lane utilization of the dominant stage.

    Under ``vmap_B(vmap_H(jacfwd(f)))`` the 43-tangent axis is the MINOR
    (lane) dimension of every intermediate in the scalarized dynamics
    graph: 43/128 = 34% lane utilization for ~60% of the solver's FLOPs
    (measured: the A/B sweep dominates; halving line-search rollouts moved
    throughput by only 3%). Here linearization is ``jax.linearize`` of the
    (H-outer, B-inner)-batched dynamics followed by one jvp per basis
    tangent, so the BATCH axis is minor — full lanes at B >= 128 — and the
    primal is still evaluated once.

    Args:
      dynamics_b: batched step f(X (B,n), U (B,m)) -> (B,n) (per-sample
        closures, e.g. per-scenario models, live inside via vmap).
      stage_cost / terminal_cost: PER-SAMPLE cost fns (vmapped inside).
      x0s: (B, n); u_inits: (B, H, m).
      dynamics_lin_b: optional reduced-precision batched dynamics for the
        A/B sweep only (see solve()).
    Returns ILQRSolution with leading batch axis on every field.
    """
    Bsz, H, m = u_inits.shape
    n = x0s.shape[1]
    dtype = x0s.dtype
    clip_u = lambda u: jnp.clip(u, config.u_min, config.u_max)

    def rollout_b(Us):
        def f(X, U):
            X2 = dynamics_b(X, clip_u(U))
            return X2, X2
        _, Xs_tail = jax.lax.scan(f, x0s, jnp.swapaxes(Us, 0, 1))
        return jnp.concatenate([x0s[:, None], jnp.swapaxes(Xs_tail, 0, 1)],
                               axis=1)                     # (B, H+1, n)

    cost_b = jax.vmap(
        lambda xs, us: _total_cost(stage_cost, terminal_cost, xs, us))

    dyn_jac_b = dynamics_lin_b if dynamics_lin_b is not None else dynamics_b

    def linearize_b(Xs, Us):
        Z = jnp.concatenate([Xs[:, :-1], Us], axis=-1)      # (B, H, nm)
        Zt = jnp.swapaxes(Z, 0, 1)                          # (H, B, nm)

        def f_hb(Zhb):
            def per_h(Zh):
                return dyn_jac_b(Zh[:, :n], Zh[:, n:])
            return jax.vmap(per_h)(Zhb)

        _, jvp_fn = jax.linearize(f_hb, Zt)
        eye = jnp.eye(n + m, dtype=Zt.dtype)
        cols = jax.vmap(
            lambda e: jvp_fn(jnp.broadcast_to(e, Zt.shape)))(eye)
        # (nm, H, B, n) -> (B, H, n, nm)
        J = jnp.transpose(cols, (2, 1, 3, 0)).astype(dtype)
        return J[..., :n], J[..., n:]

    hess_cost = jax.vmap(jax.vmap(
        jax.jacfwd(lambda z, t: jnp.concatenate(
            jax.grad(stage_cost, argnums=(0, 1))(z[:n], z[n:], t)),
            argnums=0), in_axes=(0, 0)), in_axes=(0, None))
    grads_cost = jax.vmap(jax.vmap(jax.grad(stage_cost, argnums=(0, 1)),
                                   in_axes=(0, 0, 0)), in_axes=(0, 0, None))
    vT_grad = jax.vmap(jax.grad(terminal_cost))
    vT_hess = jax.vmap(jax.hessian(terminal_cost))

    if config.backward == "parallel":
        riccati_b = jax.vmap(_parallel_lqt_backward)
    else:
        riccati_b = jax.vmap(
            lambda A, B, lx, lu, lxx, luu, lux, Vx, Vxx, reg:
            riccati_sequential(A, B, lx, lu, lxx, luu, lux, Vx, Vxx, reg,
                               config))

    def backward_b(Xs, Us, regs, AB):
        ts = jnp.arange(H)
        Z = jnp.concatenate([Xs[:, :-1], Us], axis=-1)
        J_lag = hess_cost(Z, ts)                            # (B,H,nm,nm)
        lxx = J_lag[..., :n, :n]
        lux = J_lag[..., n:, :n]
        luu = J_lag[..., n:, n:]
        lx, lu = grads_cost(Xs[:, :-1], Us, ts)
        Vx = vT_grad(Xs[:, -1])
        Vxx = vT_hess(Xs[:, -1])
        A, Bm = AB
        return riccati_b(A, Bm, lx, lu, lxx, luu, lux, Vx, Vxx, regs)

    def forward_b(Xs, Us, ks, Ks, alpha):
        def fstep(X, inp):
            X_ref, U_ref, k, K = inp
            U = clip_u(U_ref + alpha * k
                       + jnp.einsum("bmn,bn->bm", K, X - X_ref))
            X2 = dynamics_b(X, U)
            return X2, (X2, U)
        _, (Xs_tail, Us_new) = jax.lax.scan(
            fstep, x0s,
            (jnp.swapaxes(Xs[:, :-1], 0, 1), jnp.swapaxes(Us, 0, 1),
             jnp.swapaxes(ks, 0, 1), jnp.swapaxes(Ks, 0, 1)),
            unroll=config.unroll)
        Xs_new = jnp.concatenate(
            [x0s[:, None], jnp.swapaxes(Xs_tail, 0, 1)], axis=1)
        Us_new = jnp.swapaxes(Us_new, 0, 1)
        return Xs_new, Us_new, cost_b(Xs_new, Us_new)

    alphas = 1.1 ** (-jnp.arange(config.n_alphas, dtype=dtype) ** 2)

    def iteration(carry, i):
        Xs, Us, cost, regs, lin = carry
        if config.relin_every <= 1:
            lin = linearize_b(Xs, Us)
        else:
            lin = jax.lax.cond((i % config.relin_every) == 0,
                               lambda: linearize_b(Xs, Us), lambda: lin)
        ks, Ks, dV, ok = backward_b(Xs, Us, regs, lin)
        Xs_c, Us_c, costs = jax.vmap(
            lambda a: forward_b(Xs, Us, ks, Ks, a))(alphas)  # (A,B,...)
        best = jnp.argmin(costs, axis=0)                     # (B,)
        bidx = jnp.arange(Bsz)
        new_cost = costs[best, bidx]
        improved = ok & (new_cost < cost) & jnp.isfinite(new_cost)
        imp_x = improved[:, None, None]
        Xs2 = jnp.where(imp_x, Xs_c[best, bidx], Xs)
        Us2 = jnp.where(imp_x, Us_c[best, bidx], Us)
        cost2 = jnp.where(improved, new_cost, cost)
        regs2 = jnp.where(
            improved,
            jnp.maximum(regs / config.reg_factor, config.reg_min),
            jnp.minimum(regs * config.reg_factor * config.reg_factor,
                        config.reg_max))
        return (Xs2, Us2, cost2, regs2, lin), cost2

    Us0 = clip_u(u_inits)
    Xs0 = rollout_b(Us0)
    cost0 = cost_b(Xs0, Us0)
    regs0 = jnp.full((Bsz,), config.reg_init, dtype)
    lin0 = (jnp.zeros((Bsz, H, n, n), dtype),
            jnp.zeros((Bsz, H, n, m), dtype))
    (Xs, Us, cost, regs, _), trace = jax.lax.scan(
        iteration, (Xs0, Us0, cost0, regs0, lin0),
        jnp.arange(config.iterations))
    return ILQRSolution(us=Us, xs=Xs, cost=cost,
                        cost_trace=jnp.swapaxes(trace, 0, 1), reg=regs)
