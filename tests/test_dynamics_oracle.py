"""Decisive dynamics validation: Euler-Lagrange autodiff oracle.

Builds the equations of motion a *second, independent* way — a Lagrangian
L(y, v) = KE - PE on a fixed local chart (δ, ε, q) with body velocities
obtained purely by jvp through forward kinematics — and checks that
forward_dynamics produces the same accelerations at random states. This is
the correctness gate for the whole compute path (the analytic replacement
of PyBullet); run in float64.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_springs_tpu.models import dynamics as dyn
from quadruped_springs_tpu.models import spatial as sp
from quadruped_springs_tpu.models.go1_params import build_model, go1_config

# x64 is enabled per-test via fixture (a module-level config.update would
# leak into every other test collected in the same process).
MODEL = None


@pytest.fixture(autouse=True)
def _x64():
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    global MODEL
    if MODEL is None:
        MODEL = build_model(dtype=jnp.float64)
    yield
    jax.config.update("jax_enable_x64", old)


def _hat(v):
    return sp.skew(v)


def _expm_so3(w):
    """Rodrigues with Taylor-safe coefficients (differentiable at w=0)."""
    th2 = jnp.dot(w, w)
    small = th2 < 1e-12
    th2_safe = jnp.where(small, 1.0, th2)  # sanitize so grads of the unsafe
    th = jnp.sqrt(th2_safe)                # branch stay finite under `where`
    A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2_safe)
    K = _hat(w)
    return jnp.eye(3) + A * K + B * (K @ K)


def _body_frames(y, R0, p0):
    """World pose of every body frame: trunk + 12 leg bodies.

    Returns (Rs (13,3,3), os (13,3)) world rotations and frame origins.
    Body order: trunk, then legs x (hip, thigh, calf).
    """
    delta, eps, q = y[:3], y[3:6], y[6:]
    R = R0 @ _expm_so3(eps)
    p = p0 + R0 @ delta
    fk = dyn.leg_fk_base(MODEL, q)
    R_legs = jnp.einsum("ab,ljbc->ljac", R, fk["R"]).reshape(12, 3, 3)
    o_legs = (p + fk["o"].reshape(12, 3) @ R.T)
    Rs = jnp.concatenate([R[None], R_legs], axis=0)
    os = jnp.concatenate([p[None], o_legs], axis=0)
    return Rs, os


def _spatial_velocities(y, v, R0, p0):
    """Spatial velocity of every body, expressed in base coords about the
    base origin — computed ONLY via jvp of FK (independent of RNEA)."""
    (Rs, os), (dRs, dos) = jax.jvp(lambda yy: _body_frames(yy, R0, p0), (y,), (v,))
    delta, eps = y[:3], y[3:6]
    R = R0 @ _expm_so3(eps)
    p = p0 + R0 @ delta
    # world angular velocity of each body: hat(w) = dR R^T
    What = jnp.einsum("bij,bkj->bik", dRs, Rs)
    w_world = jnp.stack([What[:, 2, 1], What[:, 0, 2], What[:, 1, 0]], axis=-1)
    # velocity of the body-fixed point currently at the base origin p:
    # v_pt = v_origin_of_body + w x (p - o_b)
    v_pt_world = dos + jnp.cross(w_world, p - os)
    # to base coords
    w_b = w_world @ R
    v_b = v_pt_world @ R
    return jnp.concatenate([w_b, v_b], axis=-1)  # (13, 6)


def _inertias_base(y):
    q = y[6:]
    fk = dyn.leg_fk_base(MODEL, q)
    I_legs = sp.transform_spatial_inertia(MODEL.leg_inertias6, fk["R"], fk["o"])
    return jnp.concatenate([MODEL.trunk_inertia6[None],
                            I_legs.reshape(12, 6, 6)], axis=0)


def _kinetic(y, v, R0, p0):
    vs = _spatial_velocities(y, v, R0, p0)
    Is = _inertias_base(y)
    return 0.5 * jnp.sum(vs * jnp.einsum("bij,bj->bi", Is, vs))


def _coms_world(y, R0, p0):
    delta, eps, q = y[:3], y[3:6], y[6:]
    R = R0 @ _expm_so3(eps)
    p = p0 + R0 @ delta
    fk = dyn.leg_fk_base(MODEL, q)
    coms_b = fk["o"] + jnp.einsum("ljab,ljb->lja", fk["R"], MODEL.leg_coms)
    mcx = MODEL.trunk_inertia6[:3, 3:]
    c_trunk = jnp.array([mcx[2, 1], mcx[0, 2], mcx[1, 0]]) / MODEL.trunk_mass
    com_t = p + R @ c_trunk
    coms_l = p + coms_b.reshape(12, 3) @ R.T
    masses = jnp.concatenate([jnp.reshape(MODEL.trunk_mass, (1,)),
                              MODEL.leg_masses.reshape(12)])
    return jnp.concatenate([com_t[None], coms_l], axis=0), masses


def _potential(y, R0, p0):
    coms, masses = _coms_world(y, R0, p0)
    return -jnp.sum(masses * (coms @ MODEL.gravity))


def oracle_accel(state: dyn.RobotState, tau):
    """Euler-Lagrange accelerations in the chart, converted to the
    moving-frame representation used by forward_dynamics."""
    R0 = sp.quat_to_mat(state.quat)
    p0 = state.pos
    w_b = R0.T @ state.ang_vel
    v_b = R0.T @ state.lin_vel
    y0 = jnp.concatenate([jnp.zeros(6), state.q])
    # chart velocities: delta_dot = R0^T p_dot = v_b ; eps_dot = w_b
    v0 = jnp.concatenate([v_b, w_b, state.qd])

    def L(y, v):
        return _kinetic(y, v, R0, p0) - _potential(y, R0, p0)

    M = jax.hessian(L, argnums=1)(y0, v0)
    dLdy = jax.grad(L, argnums=0)(y0, v0)
    C = jax.jacfwd(jax.grad(L, argnums=1), argnums=0)(y0, v0)
    Q = jnp.concatenate([jnp.zeros(6), tau])
    vdot = jnp.linalg.solve(M, Q + dLdy - C @ v0)
    ddelta, deps, qdd = vdot[:3], vdot[3:6], vdot[6:]
    # chart -> moving frame: wdot_b = eps_ddot ; vdot_b = delta_ddot - w x v_b
    a0 = jnp.concatenate([deps, ddelta - jnp.cross(w_b, v_b)])
    return a0, qdd


def _f64_state(pos, quat, lin, ang, q, qd):
    return dyn.RobotState(
        pos=jnp.asarray(pos, jnp.float64),
        quat=sp.quat_normalize(jnp.asarray(quat, jnp.float64)),
        lin_vel=jnp.asarray(lin, jnp.float64),
        ang_vel=jnp.asarray(ang, jnp.float64),
        q=jnp.asarray(q, jnp.float64),
        qd=jnp.asarray(qd, jnp.float64),
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_forward_dynamics_matches_lagrangian_oracle(seed):
    rng = np.random.RandomState(seed)
    cfg = go1_config(True)
    state = _f64_state(
        pos=[0.1 * rng.randn(), 0.1 * rng.randn(), 2.0],
        quat=rng.randn(4),
        lin=0.5 * rng.randn(3),
        ang=1.5 * rng.randn(3),
        q=np.asarray(cfg.init_joint_angles) + 0.3 * rng.randn(12),
        qd=1.0 * rng.randn(12),
    )
    tau = jnp.asarray(2.0 * rng.randn(12))
    params = dyn.default_sim_params()
    a0, qdd, info = dyn.forward_dynamics(MODEL, params, state, tau)
    assert not bool(info["feet_in_contact"].any()), "state must be airborne"
    a0_ref, qdd_ref = oracle_accel(state, tau)
    # rtol floor set by the 1e-9 Tikhonov eps in solve_star
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a0_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(qdd), np.asarray(qdd_ref),
                               rtol=1e-5, atol=1e-5)
