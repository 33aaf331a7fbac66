"""Profile the iLQR solve components on the current device.

Times, for the bench configuration (H=50, batch 256):
  - one control-knot dynamics eval (batched)
  - the horizon-batched linearization (jacfwd A,B)
  - the backward Riccati scan (with/without the eigvalsh LM shift)
  - one forward line-search rollout (8 alphas)
  - one full iteration / full solve
"""

import time

import jax
import jax.numpy as jnp

from quadruped_springs_tpu.env import randomizers as rnd
from quadruped_springs_tpu.solver import ilqr
from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem

BATCH = 256
H = 50


def bench_fn(fn, *args, n=3, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:45s} {dt*1e3:10.2f} ms")
    return dt


def main():
    prob = MPCProblem(MPCConfig(
        task="JUMPING_IN_PLACE", enable_springs=True,
        horizon=H, iterations=10, n_alphas=8))
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, BATCH)
    scenarios = jax.vmap(
        lambda k: rnd.sample_scenario(prob.cfg, "TEST_RANDOMIZER", k))(keys)
    x0 = prob.default_x0()
    u0 = prob.task_warm_start()
    x0s = jnp.broadcast_to(x0, (BATCH,) + x0.shape)
    u0s = jnp.broadcast_to(u0, (BATCH,) + u0.shape)

    # single knot dynamics, batched over B*H
    dyn_b = jax.jit(jax.vmap(lambda x, u: prob.dynamics(x, u)))
    xs_flat = jnp.broadcast_to(x0, (BATCH * H,) + x0.shape)
    us_flat = jnp.zeros((BATCH * H, prob.action_dim))
    bench_fn(dyn_b, xs_flat, us_flat, name=f"dynamics eval (B*H={BATCH*H})")

    # linearization: jacfwd over x and u, batched over B*H
    fx = jax.jit(jax.vmap(jax.jacfwd(lambda x, u: prob.dynamics(x, u),
                                     argnums=(0, 1))))
    bench_fn(fx, xs_flat, us_flat, name="linearization jacfwd A,B (B*H)")

    # nonlinear rollout, sequential H, batched over B*alphas
    def rollout(x0, us):
        def f(x, u):
            x2 = prob.dynamics(x, jnp.clip(u, -1, 1))
            return x2, x2
        _, xs = jax.lax.scan(f, x0, us)
        return xs
    ro = jax.jit(jax.vmap(rollout))
    x08 = jnp.broadcast_to(x0, (BATCH * 8,) + x0.shape)
    u08 = jnp.zeros((BATCH * 8, H, prob.action_dim))
    bench_fn(ro, x08, u08, name="rollout scan H=50 (B*8 alphas)")

    # backward scan proxy: random A,B + eigvalsh/cho per knot
    kk = jax.random.PRNGKey(1)
    n, m = 37, prob.action_dim
    A = 0.01 * jax.random.normal(kk, (BATCH, H, n, n)) + jnp.eye(n)
    B = 0.01 * jax.random.normal(kk, (BATCH, H, n, m))

    def backward(A, B, use_eig):
        def bstep(carry, inp):
            Vx, Vxx = carry
            A_t, B_t = inp
            Qu = B_t.T @ Vx
            Quu = B_t.T @ Vxx @ B_t + jnp.eye(m)
            Qux = B_t.T @ Vxx @ A_t
            if use_eig:
                evals = jnp.linalg.eigvalsh(Quu)
                mu = jnp.maximum(-evals[0], 0.0) + 1e-6
            else:
                offdiag = jnp.sum(jnp.abs(Quu), axis=1) - jnp.abs(jnp.diag(Quu))
                gersh = jnp.min(jnp.diag(Quu) - offdiag)
                mu = jnp.maximum(-gersh, 0.0) + 1e-6
            Quu_r = Quu + mu * jnp.eye(m)
            L, lower = jax.scipy.linalg.cho_factor(Quu_r)
            k = -jax.scipy.linalg.cho_solve((L, lower), Qu)
            K = -jax.scipy.linalg.cho_solve((L, lower), Qux)
            Vx2 = A_t.T @ Vx + K.T @ Qu
            Vxx2 = A_t.T @ Vxx @ A_t + K.T @ Qux
            return (Vx2, 0.5 * (Vxx2 + Vxx2.T)), (k, K)
        init = (jnp.zeros(n), jnp.eye(n))
        _, (ks, Ks) = jax.lax.scan(bstep, init, (A, B), reverse=True)
        return ks, Ks

    bw_eig = jax.jit(jax.vmap(lambda a, b: backward(a, b, True)))
    bw_gersh = jax.jit(jax.vmap(lambda a, b: backward(a, b, False)))
    bench_fn(bw_eig, A, B, name="backward scan w/ eigvalsh (B)")
    bench_fn(bw_gersh, A, B, name="backward scan w/ Gershgorin (B)")

    # full solve
    solve = jax.jit(lambda x, u, s: jax.vmap(prob.solve)(x, u, s))
    bench_fn(solve, x0s, u0s, scenarios, name="full solve (10 iters)")


if __name__ == "__main__":
    main()
