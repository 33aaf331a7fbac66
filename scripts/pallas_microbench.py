"""Measure the Pallas kernels vs their jnp/XLA equivalents on the chip.

Decides the round-1 open question (ops/pallas_kernels.py is currently
unreachable from any product path): either the fused kernels beat XLA's
fusion of the same ops at hot-path batch sizes — then they get wired into
the rollout path — or XLA wins and the kernels are deleted with this
measurement recorded. Prints one JSON line per (op, batch).

Usage: python scripts/pallas_microbench.py [--cpu-interpret]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

interpret = "--cpu-interpret" in sys.argv
if interpret:
    jax.config.update("jax_platforms", "cpu")

from quadruped_springs_tpu.models import dynamics as dyn  # noqa: E402
from quadruped_springs_tpu.models.go1_params import build_model, go1_config  # noqa: E402
from quadruped_springs_tpu.ops import actuation as act  # noqa: E402
from quadruped_springs_tpu.ops import pallas_kernels as pk  # noqa: E402

cfg = go1_config(True)
model = build_model()
params = dyn.default_sim_params()


def timeit(fn, *args, reps=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e6  # us


def bench_actuation(B):
    key = jax.random.PRNGKey(0)
    q_des, q, qd = jax.random.normal(key, (3, B, 12))
    kp = jnp.full(12, 75.0)
    kd = jnp.tile(cfg.motor_kd, 1)
    k12 = jnp.tile(cfg.spring_stiffness, 4)
    b12 = jnp.tile(cfg.spring_damping, 4)
    r12 = jnp.tile(cfg.spring_rest_angles, 4)

    pallas_fn = jax.jit(lambda a, b, c: pk.fused_actuation(
        a, b, c, kp, kd, cfg.torque_limits, k12, b12, r12,
        interpret=interpret))

    def jnp_path(a, b, c):
        tau_m = act.pd_torque(a, b, c, kp, kd, cfg.torque_limits)
        tau_s = act.spring_torque(b, c, cfg.spring_stiffness,
                                  cfg.spring_damping, cfg.spring_rest_angles)
        return tau_m + tau_s, tau_m

    jnp_fn = jax.jit(jnp_path)
    t_p = timeit(pallas_fn, q_des, q, qd)
    t_j = timeit(jnp_fn, q_des, q, qd)
    print(json.dumps({"op": "actuation", "batch": B,
                      "pallas_us": round(t_p, 1), "jnp_us": round(t_j, 1),
                      "pallas_speedup": round(t_j / t_p, 3)}), flush=True)


def bench_contact(B):
    key = jax.random.PRNGKey(1)
    phi = jax.random.uniform(key, (B, 4), minval=-0.01, maxval=0.01)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, 4, 3))

    pallas_fn = jax.jit(lambda p, vv: pk.fused_contact(
        p, vv, params.friction, params.contact_stiffness,
        params.contact_damping, params.slip_vel_tol, interpret=interpret))

    def jnp_path(p, vv):
        elastic = params.contact_stiffness * p
        damping = jnp.clip(params.contact_damping * (-vv[..., 2]),
                           -elastic, elastic)
        fn = jnp.where(p > 0, jnp.maximum(elastic + damping, 0.0), 0.0)
        vt = vv[..., :2]
        vtn = jnp.sqrt(jnp.maximum(jnp.sum(vt * vt, -1), 1e-12))
        scale = params.friction * fn / jnp.maximum(vtn, params.slip_vel_tol)
        return jnp.concatenate([-scale[..., None] * vt, fn[..., None]], -1)

    jnp_fn = jax.jit(jnp_path)
    t_p = timeit(pallas_fn, phi, v)
    t_j = timeit(jnp_fn, phi, v)
    print(json.dumps({"op": "contact", "batch": B,
                      "pallas_us": round(t_p, 1), "jnp_us": round(t_j, 1),
                      "pallas_speedup": round(t_j / t_p, 3)}), flush=True)


for B in (1024, 8192, 65536):
    bench_actuation(B)
    bench_contact(B)
