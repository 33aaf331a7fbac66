"""Pallas TPU kernels for the hot per-substep ops.

The 1 kHz inner loop applies, per scenario: PD torque + clip, the one-sided
PEA spring law, and the compliant contact force. For large scenario batches
these are fused here into single VMEM-resident kernels so the (B, 12)/(B, 4)
operands make one HBM round trip per substep instead of one per op.

Layout: operands are held motor-major — shape (12, B) with the batch on the
128-wide lane axis (12 joints sit on sublanes) — so a (12, B) f32 block
wastes only the 12→16 sublane pad instead of the 12→128 lane pad the
batch-major layout would.

All kernels have jnp reference implementations in ops/actuation.py /
models/dynamics.py; tests compare against them (interpret mode on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quadruped_springs_tpu.ops.actuation import SPRING_ENGAGE_SIGN

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
