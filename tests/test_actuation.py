"""Actuation unit tests: PD clip law, one-sided spring piecewise law,
action interface scaling/symmetry, Butterworth filter vs scipy lfilter."""

import jax.numpy as jnp
import numpy as np
from scipy.signal import butter, lfilter

from quadruped_springs_tpu.control import interfaces as ci
from quadruped_springs_tpu.models.go1_params import go1_config
from quadruped_springs_tpu.ops import actuation as act
from quadruped_springs_tpu.ops import action_filter as af


def test_pd_torque_clipping():
    cfg = go1_config(True)
    q = jnp.zeros(12)
    qd = jnp.zeros(12)
    q_des = jnp.ones(12) * 10.0  # far away -> saturate
    tau = act.pd_torque(q_des, q, qd, cfg.motor_kp, cfg.motor_kd, cfg.torque_limits)
    np.testing.assert_allclose(tau, cfg.torque_limits, atol=1e-6)
    # small error -> linear law
    q_des = jnp.full(12, 0.01)
    tau = act.pd_torque(q_des, q, qd, cfg.motor_kp, cfg.motor_kd, cfg.torque_limits)
    np.testing.assert_allclose(tau, cfg.motor_kp * 0.01, rtol=1e-5)


def test_spring_piecewise_law():
    """Check engagement per joint type and side against springs.py:34-61."""
    cfg = go1_config(True)
    rest = np.asarray(cfg.spring_rest_angles)
    k = np.asarray(cfg.spring_stiffness)
    d = np.asarray(cfg.spring_damping)

    # all joints exactly at rest, zero velocity -> zero torque
    q = jnp.tile(jnp.asarray(rest), 4)
    tau = act.spring_torque(q, jnp.zeros(12), k, d, rest)
    np.testing.assert_allclose(tau, 0.0, atol=1e-7)

    # thigh above rest -> engaged (tau = -k dq); below rest -> off
    dq = 0.2
    q_up = q.at[1].add(dq)   # FR thigh
    tau = act.spring_torque(q_up, jnp.zeros(12), k, d, rest)
    np.testing.assert_allclose(tau[1], -k[1] * dq, rtol=1e-5)
    q_dn = q.at[1].add(-dq)
    tau = act.spring_torque(q_dn, jnp.zeros(12), k, d, rest)
    assert tau[1] == 0.0

    # calf below rest -> engaged; above -> off
    q_dn = q.at[2].add(-dq)  # FR calf
    tau = act.spring_torque(q_dn, jnp.zeros(12), k, d, rest)
    np.testing.assert_allclose(tau[2], k[2] * dq, rtol=1e-5)
    q_up = q.at[2].add(dq)
    tau = act.spring_torque(q_up, jnp.zeros(12), k, d, rest)
    assert tau[2] == 0.0

    # hips: FR (right, idx 0) engaged iff q <= rest; FL (left, idx 3) iff >=
    q_dn = q.at[0].add(-dq)
    tau = act.spring_torque(q_dn, jnp.zeros(12), k, d, rest)
    np.testing.assert_allclose(tau[0], k[0] * dq, rtol=1e-5)
    q_up = q.at[0].add(dq)
    assert act.spring_torque(q_up, jnp.zeros(12), k, d, rest)[0] == 0.0
    q_up = q.at[3].add(dq)   # FL hip above rest -> engaged
    tau = act.spring_torque(q_up, jnp.zeros(12), k, d, rest)
    np.testing.assert_allclose(tau[3], -k[0] * dq, rtol=1e-5)
    q_dn = q.at[3].add(-dq)
    assert act.spring_torque(q_dn, jnp.zeros(12), k, d, rest)[3] == 0.0

    # damping acts only when engaged
    qd = jnp.full(12, 0.5)
    q_eng = q.at[1].add(dq)
    tau = act.spring_torque(q_eng, qd, k, d, rest)
    np.testing.assert_allclose(tau[1], -k[1] * dq - d[1] * 0.5, rtol=1e-5)


def test_interface_scaling_roundtrip():
    cfg = go1_config(True)
    for mode in ("PD", "CARTESIAN_PD", "TORQUE"):
        iface = ci.make_interface(cfg, mode, "DEFAULT")
        a = jnp.linspace(-0.9, 0.9, 12)
        cmd = ci.scale_action_to_command(iface, a)
        a_rec = ci.scale_command_to_action(iface, cmd)
        np.testing.assert_allclose(a_rec, a, atol=1e-5)
        assert bool(jnp.all(cmd >= iface.lower_lim - 1e-6))
        assert bool(jnp.all(cmd <= iface.upper_lim + 1e-6))


def test_symmetric_expansion():
    cfg = go1_config(True)
    iface = ci.make_interface(cfg, "PD", "SYMMETRIC")
    a6 = jnp.array([0.1, 0.2, -0.3, 0.4, -0.5, 0.6])
    a12 = ci.expand_action(iface, a6)
    assert a12.shape == (12,)
    # FL mirrors FR with hip negated (symm_idx=0 for PD)
    np.testing.assert_allclose(a12[3], -a12[0])
    np.testing.assert_allclose(a12[4:6], a12[1:3])
    np.testing.assert_allclose(a12[9], -a12[6])
    back = ci.contract_action(iface, a12)
    np.testing.assert_allclose(back, a6)


def test_symmetric_no_hip():
    cfg = go1_config(True)
    iface = ci.make_interface(cfg, "PD", "SYMMETRIC_NO_HIP")
    a4 = jnp.array([0.1, 0.2, -0.3, 0.4])
    a12 = ci.expand_action(iface, a4)
    np.testing.assert_allclose(a12[0], 0.0)   # hip forced 0
    np.testing.assert_allclose(a12[3], 0.0)
    np.testing.assert_allclose(a12[1:3], a4[0:2])
    back = ci.contract_action(iface, a12)
    np.testing.assert_allclose(back, a4)


def test_backflip_limits_raised():
    cfg = go1_config(True)
    iface = ci.make_interface(cfg, "PD", "DEFAULT", task_env="BACKFLIP")
    np.testing.assert_allclose(float(iface.upper_lim[7]), np.pi / 2, rtol=1e-6)
    np.testing.assert_allclose(float(iface.upper_lim[10]), np.pi / 2, rtol=1e-6)
    np.testing.assert_allclose(float(iface.upper_lim[1]), np.pi / 4 + 0.5, rtol=1e-6)


def test_cartesian_action_to_command_is_ik():
    cfg = go1_config(True)
    iface = ci.make_interface(cfg, "CARTESIAN_PD", "DEFAULT")
    a = jnp.zeros(12)  # mid-range foot targets
    qdes = ci.action_to_command(iface, a)
    # FK of the IK result must land on the scaled foot targets
    from quadruped_springs_tpu.models import kinematics as kin
    foot = kin.foot_position(qdes.reshape(4, 3)).reshape(12)
    target = ci.scale_action_to_command(iface, a)
    np.testing.assert_allclose(foot, target, atol=1e-4)


def test_butterworth_matches_scipy():
    sr = 100.0
    coeffs = af.butter_coeffs(sr)
    b, a = butter(2, 3.0 / (0.5 * sr), btype="low")
    rng = np.random.RandomState(0)
    x = rng.randn(50, 6).astype(np.float32)
    ref = lfilter(b, a, x, axis=0)
    state = af.filter_reset(6)
    ys = []
    for t in range(50):
        state, y = af.filter_step(coeffs, state, jnp.asarray(x[t]))
        ys.append(np.asarray(y))
    np.testing.assert_allclose(np.stack(ys), ref, atol=1e-4)


def test_butterworth_init_history_passes_dc():
    """History primed with a constant action -> output stays at that action."""
    coeffs = af.butter_coeffs(100.0)
    x0 = jnp.full(4, 0.7)
    state = af.filter_reset(4, x0)
    for _ in range(5):
        state, y = af.filter_step(coeffs, state, x0)
    np.testing.assert_allclose(y, x0, atol=1e-4)
