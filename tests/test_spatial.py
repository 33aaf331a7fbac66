"""Spatial algebra tests: quaternion ops vs rotation matrices, euler
conventions vs scipy, spatial inertia properties."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as R

from quadruped_springs_tpu.models import spatial as sp


def _rand_quat(key, n):
    q = jax.random.normal(key, (n, 4))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_rotate_matches_matrix():
    key = jax.random.PRNGKey(0)
    q = _rand_quat(key, 16)
    v = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    out = sp.quat_rotate(q, v)
    mats = sp.quat_to_mat(q)
    np.testing.assert_allclose(out, jnp.einsum("nij,nj->ni", mats, v), atol=1e-5)
    # against scipy (scipy uses xyzw too)
    out_scipy = R.from_quat(np.asarray(q)).apply(np.asarray(v))
    np.testing.assert_allclose(out, out_scipy, atol=1e-5)


def test_quat_mul_composition():
    q1 = _rand_quat(jax.random.PRNGKey(2), 8)
    q2 = _rand_quat(jax.random.PRNGKey(3), 8)
    v = jax.random.normal(jax.random.PRNGKey(4), (8, 3))
    lhs = sp.quat_rotate(sp.quat_mul(q1, q2), v)
    rhs = sp.quat_rotate(q1, sp.quat_rotate(q2, v))
    np.testing.assert_allclose(lhs, rhs, atol=1e-5)


def test_rpy_roundtrip_and_scipy_convention():
    rpy = jnp.array([[0.3, -0.7, 1.2], [0.0, 0.0, 0.0], [-1.0, 0.4, -2.0]])
    q = sp.rpy_to_quat(rpy)
    back = sp.quat_to_rpy(q)
    np.testing.assert_allclose(back, rpy, atol=1e-5)
    # PyBullet euler == scipy 'xyz' extrinsic
    q_scipy = R.from_euler("xyz", np.asarray(rpy)).as_quat()
    np.testing.assert_allclose(np.abs(np.sum(q * q_scipy, axis=-1)), 1.0, atol=1e-5)


def test_quat_integrate_constant_omega():
    q0 = jnp.array([0.0, 0.0, 0.0, 1.0])
    omega = jnp.array([0.0, 2.0, 0.0])
    q = q0
    for _ in range(100):
        q = sp.quat_integrate(q, omega, 0.01)
    # After 1s of 2 rad/s about y -> pitch = 2 rad... but arcsin caps at pi/2;
    # check via rotation matrix angle instead.
    ang = 2 * jnp.arccos(jnp.clip(jnp.abs(q[3]), 0, 1))
    np.testing.assert_allclose(ang, 2.0, atol=1e-5)


def test_pitch_unwrapped_yxz_matches_scipy():
    rng = np.random.RandomState(0)
    for _ in range(20):
        q = R.random(random_state=rng).as_quat()
        euler = R.from_quat(q).as_euler("yxz")
        ref = -euler[0]
        got = sp.pitch_unwrapped_yxz(jnp.asarray(q), jnp.asarray(False))
        np.testing.assert_allclose(got, ref, atol=1e-5)
        ref_switched = ref + 2 * np.pi if ref < 0 else ref
        got_sw = sp.pitch_unwrapped_yxz(jnp.asarray(q), jnp.asarray(True))
        np.testing.assert_allclose(got_sw, ref_switched, atol=1e-5)


def test_spatial_inertia_point_mass():
    m = jnp.asarray(2.0)
    c = jnp.array([0.1, -0.2, 0.3])
    I6 = sp.spatial_inertia(m, c, jnp.zeros((3, 3)))
    # kinetic energy of point mass under pure rotation w: 0.5 m |w x c|^2
    w = jnp.array([0.5, 1.0, -0.3])
    v6 = jnp.concatenate([w, jnp.zeros(3)])
    ke = 0.5 * v6 @ I6 @ v6
    ke_ref = 0.5 * 2.0 * jnp.sum(jnp.cross(w, c) ** 2)
    np.testing.assert_allclose(ke, ke_ref, atol=1e-6)


def test_transform_spatial_inertia_preserves_ke():
    """KE is invariant: v'ᵀ I' v' == vᵀ I v with v' the transformed twist."""
    key = jax.random.PRNGKey(5)
    q = _rand_quat(key, 1)[0]
    Rm = sp.quat_to_mat(q)
    p = jnp.array([0.2, -0.1, 0.4])
    m = jnp.asarray(1.7)
    c = jnp.array([0.05, 0.02, -0.08])
    Ic = jnp.diag(jnp.array([0.01, 0.02, 0.015]))
    I_local = sp.spatial_inertia(m, c, Ic)
    I_common = sp.transform_spatial_inertia(I_local, Rm, p)
    # twist in common frame
    v_common = jnp.array([0.3, -0.5, 0.2, 1.0, 0.1, -0.7])
    # same twist in local frame: w_l = Rᵀ w, v_l = Rᵀ (v + w × (-p))? Use
    # motion transform X_m = [[Rᵀ,0],[-Rᵀ p×, Rᵀ]]
    w = v_common[:3]
    vo = v_common[3:]
    w_l = Rm.T @ w
    v_l = Rm.T @ (vo + jnp.cross(w, -p) * -1)  # v_local_origin = v + w×(p_origin)
    # velocity of point p: vo + w × p
    v_l = Rm.T @ (vo + jnp.cross(w, p))
    v_local = jnp.concatenate([w_l, v_l])
    ke_common = v_common @ I_common @ v_common
    ke_local = v_local @ I_local @ v_local
    np.testing.assert_allclose(ke_common, ke_local, rtol=1e-5)


def test_cross_operators_consistent():
    v = jnp.array([0.1, 0.2, 0.3, -0.4, 0.5, -0.6])
    m = jnp.array([1.0, -2.0, 0.5, 0.3, 0.7, -1.1])
    np.testing.assert_allclose(sp.crm(v) @ m, sp.spatial_cross_motion(v, m), atol=1e-6)
    np.testing.assert_allclose(sp.crf(v) @ m, sp.spatial_cross_force(v, m), atol=1e-6)
