"""Kinematics unit tests: Jacobian vs autodiff FK, IK∘FK identity, mirroring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quadruped_springs_tpu.models import kinematics as kin
from quadruped_springs_tpu.models.go1_params import (
    HIP_LINK_LENGTH,
    SIDE_SIGN,
    go1_config,
)


def _sample_q(key, n):
    cfg = go1_config(True)
    lo = np.asarray(cfg.rl_lower_angle_joint).reshape(4, 3)
    hi = np.asarray(cfg.rl_upper_angle_joint).reshape(4, 3)
    u = jax.random.uniform(key, (n, 4, 3))
    return lo + u * (hi - lo)


def test_jacobian_matches_autodiff():
    q = _sample_q(jax.random.PRNGKey(0), 32)
    jac_analytic = kin.foot_jacobian(q)
    jac_auto = jax.vmap(jax.jacfwd(kin.foot_position))(q)
    # jacfwd of (4,3)->(4,3) gives (4,3,4,3); take the block-diagonal legs
    jac_auto = jnp.einsum("nixiy->nixy", jac_auto)
    np.testing.assert_allclose(jac_analytic, jac_auto, atol=1e-5)


def test_ik_fk_roundtrip():
    q = _sample_q(jax.random.PRNGKey(1), 64)
    pos = kin.foot_position(q)
    q_rec = kin.inverse_kinematics(pos)
    pos_rec = kin.foot_position(q_rec)
    np.testing.assert_allclose(pos_rec, pos, atol=1e-4)
    # within the RL joint range the IK branch is unique -> angles match too
    np.testing.assert_allclose(q_rec, q, atol=1e-3)


def test_default_pose_foot_position():
    """At the default pose [0, pi/4, -pi/2] the foot should sit at the
    nominal foot position (0, ±hip_len, -0.32-ish) used by the config."""
    q = jnp.array([[0.0, np.pi / 4, -np.pi / 2]] * 4)
    pos = kin.foot_position(q)
    # x: -l3*sin(q2+q3) - l2*sin(q2) with q2=45deg,q3=-90deg
    l2 = l3 = 0.213
    x_expected = -l3 * np.sin(-np.pi / 4) - l2 * np.sin(np.pi / 4)
    assert abs(x_expected) < 1e-9
    np.testing.assert_allclose(pos[:, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(pos[:, 1], SIDE_SIGN * HIP_LINK_LENGTH, atol=1e-6)
    z_expected = -l3 * np.cos(-np.pi / 4) - l2 * np.cos(np.pi / 4)
    np.testing.assert_allclose(pos[:, 2], z_expected, atol=1e-6)


def test_left_right_mirroring():
    """Mirroring the hip angle should mirror the foot y position."""
    q_fr = jnp.array([0.1, 0.6, -1.5])
    q = jnp.stack([q_fr, q_fr * jnp.array([-1, 1, 1]), q_fr, q_fr * jnp.array([-1, 1, 1])])
    pos = kin.foot_position(q)
    np.testing.assert_allclose(pos[0, 1], -pos[1, 1], atol=1e-6)
    np.testing.assert_allclose(pos[0, 0], pos[1, 0], atol=1e-6)
    np.testing.assert_allclose(pos[0, 2], pos[1, 2], atol=1e-6)


def test_flat_wrappers():
    q = _sample_q(jax.random.PRNGKey(2), 8).reshape(8, 12)
    qd = jnp.ones((8, 12)) * 0.3
    pos, vel = kin.foot_pos_and_vel(q, qd)
    assert pos.shape == (8, 12) and vel.shape == (8, 12)
    q_rec = kin.inverse_kinematics_flat(pos)
    np.testing.assert_allclose(q_rec, q, atol=1e-3)
