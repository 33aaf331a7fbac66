"""Measure linearization layouts for the iLQR A/B sweep on the chip.

Hypothesis: under vmap(batch) o vmap(H) o jacfwd, the 43-tangent axis is
the minor (lane) dimension -> 43/128 = 34% lane utilization for the
dominant compute of the solver. A batch-minor layout — jax.linearize of
the (H, B)-batched dynamics, then one jvp per basis tangent — puts the
1024-wide batch on lanes instead.

Variants:
  jacfwd_hb : current solver layout  vmap_B(vmap_H(jacfwd(dyn)))
  linearize : jax.linearize(vmap_H(vmap_B(dyn)), Z) + vmapped basis jvps

Prints one JSON line per variant (time per full-batch linearization).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem  # noqa: E402

B, H = 1024, 50
prob = MPCProblem(MPCConfig(task="JUMPING_IN_PLACE", enable_springs=True,
                            horizon=H, iterations=10))
n, m = 37, prob.action_dim
nm = n + m

dyn_z = lambda z: prob.dynamics(z[:n], z[n:])

key = jax.random.PRNGKey(0)
x0 = prob.default_x0()
Z_bh = (jnp.broadcast_to(jnp.concatenate([x0, jnp.zeros(m)]), (B, H, nm))
        + 0.01 * jax.random.normal(key, (B, H, nm)))


@jax.jit
def jacfwd_hb(Z):
    return jax.vmap(jax.vmap(jax.jacfwd(dyn_z)))(Z)          # (B, H, n, nm)


@jax.jit
def linearize_basis(Z):
    Zt = jnp.swapaxes(Z, 0, 1)                               # (H, B, nm)
    f_hb = jax.vmap(jax.vmap(dyn_z))                          # H outer, B inner
    _, jvp_fn = jax.linearize(f_hb, Zt)
    eye = jnp.eye(nm, dtype=Z.dtype)

    def one(e):
        return jvp_fn(jnp.broadcast_to(e, Zt.shape))          # (H, B, n)

    cols = jax.vmap(one)(eye)                                 # (nm, H, B, n)
    return cols


def bench(name, fn, Z):
    t0 = time.perf_counter()
    out = fn(Z)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        jax.block_until_ready(fn(Z))
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"layout": name, "ms_per_batch_linearization":
                      round(dt * 1e3, 2), "compile_s": round(compile_s, 1)}),
          flush=True)


bench("jacfwd_hb", jacfwd_hb, Z_bh)
bench("linearize_basis", linearize_basis, Z_bh)
