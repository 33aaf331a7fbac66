"""Unit tests for the independent rigid-contact LCP oracle
(utils/lcp_oracle.py): statics, non-penetration, friction-cone respect,
and smooth-phase (flight) agreement with the production dynamics."""

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_springs_tpu.models import dynamics as dyn
from quadruped_springs_tpu.models.go1_params import build_model, go1_config
from quadruped_springs_tpu.utils import lcp_oracle as lo

CFG = go1_config(True)


def _init_state(z=0.32):
    return lo.OracleState(
        pos=np.array([0.0, 0.0, z]),
        quat=np.array([0.0, 0.0, 0.0, 1.0]),
        lin_vel=np.zeros(3), ang_vel=np.zeros(3),
        q=np.asarray(CFG.init_joint_angles, np.float64), qd=np.zeros(12))


def _pd(st, q_des, kp=75.0):
    kd = np.asarray(CFG.motor_kd, np.float64) * np.ones(12)
    tau = -kp * (st.q - q_des) - kd * st.qd
    lim = np.asarray(CFG.torque_limits, np.float64)
    return np.clip(tau, -lim, lim)


def _settle(oracle, st, n=800):
    q_des = np.asarray(CFG.init_joint_angles, np.float64)
    for _ in range(n):
        st = oracle.step(st, _pd(st, q_des))
    return st


def test_statics_stand_no_penetration():
    """PD-held stance must converge to rest with feet ON the plane: rigid
    contact keeps penetration at the millimeter-slop scale, not the
    compliant ~mg/4k sag, and the robot neither sinks nor bounces."""
    oracle = lo.LCPOracle()
    st = _settle(oracle, _init_state(), n=800)
    assert np.linalg.norm(st.lin_vel) < 0.05, st.lin_vel
    assert np.abs(st.qd).max() < 0.5, st.qd
    # foot heights: sphere bottom within 1 mm of the plane
    rs = st.to_robot_state()
    model = build_model()
    p_w, _, _ = dyn.foot_state_world(model, rs)
    bottom = np.asarray(p_w[:, 2]) - float(model.foot_radius)
    assert np.all(bottom > -2e-3), bottom   # no deep penetration
    assert np.all(bottom < 2e-3), bottom    # and actually touching
    # standing height preserved
    assert 0.25 < st.pos[2] < 0.36, st.pos


def test_normal_forces_balance_weight():
    """Summed normal impulses over a settled step equal weight * dt."""
    oracle = lo.LCPOracle()
    st = _settle(oracle, _init_state(), n=800)
    # one more step: vertical momentum change must vanish => contact
    # impulses balance gravity. Verify via velocity stationarity.
    st2 = oracle.step(st, _pd(st, np.asarray(CFG.init_joint_angles)))
    assert abs(st2.lin_vel[2] - st.lin_vel[2]) < 1e-2


def test_flight_phase_matches_production_dynamics():
    """With no contact the oracle is pure smooth dynamics — it must match
    models/dynamics.py step-for-step (same M/h, same integrator)."""
    oracle = lo.LCPOracle()
    st = _init_state(z=1.0)  # airborne
    model = build_model()
    params = dyn.default_sim_params(0.001)
    rs = st.to_robot_state()
    tau = np.zeros(12)
    for _ in range(20):
        st = oracle.step(st, tau)
        rs, _ = dyn.step(model, params, rs, jnp.zeros(12),
                         CFG.velocity_limits)
    np.testing.assert_allclose(st.pos, np.asarray(rs.pos), atol=2e-4)
    np.testing.assert_allclose(st.q, np.asarray(rs.q), atol=2e-4)
    np.testing.assert_allclose(st.lin_vel, np.asarray(rs.lin_vel), atol=2e-3)


def test_friction_resists_slide():
    """A settled robot commanded to splay its legs must not slide its feet
    at mu=1 (stiction holds); with mu ~ 0 the feet slip outward."""
    def foot_spread(mu):
        oracle = lo.LCPOracle(params=lo.OracleParams(friction=mu))
        st = _settle(oracle, _init_state(), n=600)
        model = build_model()
        p0, _, _ = dyn.foot_state_world(model, st.to_robot_state())
        spread0 = float(np.mean(np.abs(np.asarray(p0)[:, 1])))
        # command hips outward (splay)
        q_des = np.asarray(CFG.init_joint_angles, np.float64).copy()
        q_des[0::3] = [-0.5, 0.5, -0.5, 0.5]  # FR,FL,RR,RL hip abduction
        for _ in range(250):
            st = oracle.step(st, _pd(st, q_des))
        p1, _, _ = dyn.foot_state_world(model, st.to_robot_state())
        spread1 = float(np.mean(np.abs(np.asarray(p1)[:, 1])))
        return spread1 - spread0

    slip_high_mu = foot_spread(1.0)
    slip_low_mu = foot_spread(0.02)
    assert slip_low_mu > slip_high_mu + 0.01, (slip_low_mu, slip_high_mu)


def test_drop_lands_without_rebound_energy():
    """Drop from 5 cm: rigid contact with zero restitution must not bounce
    the base back above its release height."""
    oracle = lo.LCPOracle()
    st = _settle(oracle, _init_state(), n=600)
    z_stand = st.pos[2]
    st.pos = st.pos + np.array([0.0, 0.0, 0.05])
    max_z_after = 0.0
    for i in range(400):
        st = oracle.step(st, _pd(st, np.asarray(CFG.init_joint_angles)))
        if i > 150:
            max_z_after = max(max_z_after, st.pos[2])
    assert max_z_after < z_stand + 0.06, (max_z_after, z_stand)
