"""Measure the Pallas kernels vs their jnp/XLA equivalents on the chip.

The kernels were measured, lost to XLA's fusion, and removed from the
package (docs/PALLAS_DECISION.md has the numbers) — they live on INLINE
here so the comparison can be re-run if the fusion landscape changes.
Prints one JSON line per (op, batch).

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

# ---- inlined Pallas kernels (removed from the package; see header) ----

from functools import partial  # noqa: E402

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from quadruped_springs_tpu.ops.actuation import SPRING_ENGAGE_SIGN  # noqa: E402

LANE = 128


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _actuation_kernel(qdes_ref, q_ref, qd_ref, kp_ref, kd_ref, tl_ref,
                      sk_ref, sb_ref, sr_ref, sign_ref, tau_ref, tau_m_ref):
    q = q_ref[:]
    qd = qd_ref[:]
    # PD with clip (quadruped_motor.py:88-97)
    tau_m = -kp_ref[:] * (q - qdes_ref[:]) - kd_ref[:] * qd
    tl = tl_ref[:]
    tau_m = jnp.clip(tau_m, -tl, tl)
    # one-sided spring (springs.py:34-79): engaged iff sign*(q-rest) >= 0
    dq = q - sr_ref[:]
    engaged = sign_ref[:] * dq >= 0.0
    tau_s = jnp.where(engaged, -sk_ref[:] * dq - sb_ref[:] * qd, 0.0)
    tau_m_ref[:] = tau_m
    tau_ref[:] = tau_m + tau_s


@partial(jax.jit, static_argnames=("interpret",))
def fused_actuation(q_des, q, qd, kp, kd, torque_limits,
                    spring_k12, spring_b12, spring_rest12,
                    interpret: bool = False):
    """Fused PD + spring + clip for a batch.

    Args:
      q_des, q, qd: (B, 12).
      kp, kd, torque_limits, spring_*12: (12,) broadcast per motor. Pass
        zero spring stiffness/damping to disable springs.
    Returns:
      (tau_total (B,12), tau_motor (B,12)).
    """
    B = q.shape[0]
    Bp = ((B + LANE - 1) // LANE) * LANE

    def prep(x):  # (B,12) -> (12,Bp) motor-major
        return _pad_to(x.T, Bp, 1)

    def prep_p(p):  # (12,) -> (12,Bp)
        return jnp.broadcast_to(p[:, None], (12, Bp))

    sign = jnp.asarray(SPRING_ENGAGE_SIGN, q.dtype)
    args = (prep(q_des), prep(q), prep(qd), prep_p(kp), prep_p(kd),
            prep_p(torque_limits), prep_p(spring_k12), prep_p(spring_b12),
            prep_p(spring_rest12), prep_p(sign))

    grid = (Bp // LANE,)
    spec = pl.BlockSpec((12, LANE), lambda i: (0, i), memory_space=pltpu.VMEM)
    tau, tau_m = pl.pallas_call(
        _actuation_kernel,
        grid=grid,
        in_specs=[spec] * 10,
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((12, Bp), q.dtype),
                   jax.ShapeDtypeStruct((12, Bp), q.dtype)),
        interpret=interpret,
    )(*args)
    return tau[:, :B].T, tau_m[:, :B].T


def _contact_kernel(phi_ref, vx_ref, vy_ref, vz_ref, mu_ref,
                    kn_ref, dn_ref, vtol_ref,
                    fx_ref, fy_ref, fz_ref):
    phi = phi_ref[:]
    in_c = phi > 0.0
    elastic = kn_ref[:] * phi
    # damping clamped to the elastic force (see dynamics.contact_forces)
    damping = jnp.clip(dn_ref[:] * (-vz_ref[:]), -elastic, elastic)
    fn = jnp.where(in_c, jnp.maximum(elastic + damping, 0.0), 0.0)
    vx, vy = vx_ref[:], vy_ref[:]
    vt2 = vx * vx + vy * vy
    vt = jnp.sqrt(jnp.where(vt2 < 1e-12, 1e-12, vt2))
    scale = mu_ref[:] * fn / jnp.maximum(vt, vtol_ref[:])
    fx_ref[:] = -scale * vx
    fy_ref[:] = -scale * vy
    fz_ref[:] = fn


@partial(jax.jit, static_argnames=("interpret",))
def fused_contact(phi, v_foot, mu, kn, dn, v_tol, interpret: bool = False):
    """Fused compliant normal + regularized Coulomb friction.

    Args:
      phi: (B, 4) penetration depths (radius - z).
      v_foot: (B, 4, 3) world foot velocities.
      mu, kn, dn: scalars or (B,) per-scenario.
      v_tol: scalar slip tolerance.
    Returns:
      (B, 4, 3) world contact forces.
    """
    B = phi.shape[0]
    Bp = ((B + LANE - 1) // LANE) * LANE

    def prep(x):  # (B,4) -> (4,Bp)
        return _pad_to(x.T, Bp, 1)

    def prep_s(s):  # scalar or (B,) -> (4,Bp)
        s = jnp.broadcast_to(jnp.asarray(s, phi.dtype), (B,))
        return _pad_to(jnp.broadcast_to(s[None, :], (4, B)), Bp, 1)

    args = (prep(phi), prep(v_foot[..., 0]), prep(v_foot[..., 1]),
            prep(v_foot[..., 2]), prep_s(mu), prep_s(kn), prep_s(dn),
            prep_s(v_tol))
    grid = (Bp // LANE,)
    spec = pl.BlockSpec((4, LANE), lambda i: (0, i), memory_space=pltpu.VMEM)
    fx, fy, fz = pl.pallas_call(
        _contact_kernel,
        grid=grid,
        in_specs=[spec] * 8,
        out_specs=(spec, spec, spec),
        out_shape=tuple(jax.ShapeDtypeStruct((4, Bp), phi.dtype) for _ in range(3)),
        interpret=interpret,
    )(*args)
    return jnp.stack([fx[:, :B].T, fy[:, :B].T, fz[:, :B].T], axis=-1)


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

    pallas_fn = jax.jit(lambda a, b, c: fused_actuation(
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

    pallas_fn = jax.jit(lambda p, vv: fused_contact(
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
