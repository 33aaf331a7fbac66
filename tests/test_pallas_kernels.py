"""Pallas kernels vs their jnp reference implementations (interpret mode on
CPU; the driver's TPU bench exercises the compiled path)."""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.models import dynamics as dyn
from quadruped_springs_tpu.models.go1_params import build_model, go1_config
from quadruped_springs_tpu.ops import actuation as act
from quadruped_springs_tpu.ops import pallas_kernels as pk


def test_fused_actuation_matches_reference():
    cfg = go1_config(True)
    rng = np.random.RandomState(0)
    B = 200  # not a multiple of 128 on purpose (padding path)
    q = jnp.asarray(rng.uniform(-1.5, 1.0, (B, 12)), jnp.float32)
    qd = jnp.asarray(rng.uniform(-5, 5, (B, 12)), jnp.float32)
    q_des = jnp.asarray(rng.uniform(-1.5, 1.0, (B, 12)), jnp.float32)
    k12 = jnp.tile(cfg.spring_stiffness, 4)
    b12 = jnp.tile(cfg.spring_damping, 4)
    r12 = jnp.tile(cfg.spring_rest_angles, 4)

    tau, tau_m = pk.fused_actuation(
        q_des, q, qd, cfg.motor_kp, cfg.motor_kd, cfg.torque_limits,
        k12, b12, r12, interpret=True)

    ref_m = act.pd_torque(q_des, q, qd, cfg.motor_kp, cfg.motor_kd,
                          cfg.torque_limits)
    ref_s = act.spring_torque(q, qd, cfg.spring_stiffness, cfg.spring_damping,
                              cfg.spring_rest_angles)
    np.testing.assert_allclose(tau_m, ref_m, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(tau, ref_m + ref_s, rtol=1e-5, atol=1e-5)


def test_fused_actuation_no_springs():
    cfg = go1_config(False)
    B = 64
    q = jnp.zeros((B, 12))
    qd = jnp.ones((B, 12))
    q_des = jnp.full((B, 12), 0.3)
    zero3 = jnp.zeros(12)
    tau, tau_m = pk.fused_actuation(
        q_des, q, qd, cfg.motor_kp, cfg.motor_kd, cfg.torque_limits,
        zero3, zero3, jnp.tile(cfg.spring_rest_angles, 4), interpret=True)
    np.testing.assert_allclose(tau, tau_m, atol=1e-6)


def test_fused_contact_matches_reference():
    model = build_model()
    params = dyn.default_sim_params()
    rng = np.random.RandomState(1)
    B = 130
    p_w = jnp.asarray(rng.uniform(-0.05, 0.1, (B, 4, 3)), jnp.float32)
    v_w = jnp.asarray(rng.uniform(-2, 2, (B, 4, 3)), jnp.float32)

    ref_f, ref_fn, _, _ = jax.vmap(
        lambda p, v: dyn.contact_forces(model, params, p, v))(p_w, v_w)

    phi = model.foot_radius - p_w[..., 2]
    f = pk.fused_contact(phi, v_w, params.friction, params.contact_stiffness,
                         params.contact_damping, params.slip_vel_tol,
                         interpret=True)
    np.testing.assert_allclose(f, ref_f, rtol=1e-4, atol=1e-4)
