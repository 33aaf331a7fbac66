"""Equivalence of the scalarized (SoA) dynamics core vs the structured
reference implementation, over random states covering flight, contact and
randomized models."""

import jax
import jax.numpy as jnp
import pytest

from quadruped_springs_tpu.env import randomizers as rnd
from quadruped_springs_tpu.models import dynamics as dyn
from quadruped_springs_tpu.models.go1_params import build_model, go1_config


def _random_state(key, z):
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    quat = jax.random.normal(k1, (4,))
    quat = quat / jnp.linalg.norm(quat)
    # bias toward upright so feet are near the ground plane
    quat = (quat + 4.0 * jnp.array([0.0, 0.0, 0.0, 1.0]))
    quat = quat / jnp.linalg.norm(quat)
    cfg = go1_config(True)
    return dyn.RobotState(
        pos=jnp.array([0.0, 0.0, z]) + 0.02 * jax.random.normal(k2, (3,)),
        quat=quat,
        lin_vel=0.5 * jax.random.normal(k3, (3,)),
        ang_vel=0.5 * jax.random.normal(k4, (3,)),
        q=cfg.init_joint_angles + 0.3 * jax.random.normal(k5, (12,)),
        qd=2.0 * jax.random.normal(k6, (12,)),
    )


@pytest.mark.parametrize("z", [0.30, 0.15, 0.8])  # contact, deep contact, flight
def test_soa_matches_ref(z):
    model = build_model()
    params = dyn.default_sim_params()
    key = jax.random.PRNGKey(int(z * 100))
    state = _random_state(key, z)
    tau = 5.0 * jax.random.normal(jax.random.PRNGKey(7), (12,))

    a_ref, q_ref, i_ref = jax.jit(
        lambda: dyn.forward_dynamics(model, params, state, tau, impl="ref"))()
    a_soa, q_soa, i_soa = jax.jit(
        lambda: dyn.forward_dynamics(model, params, state, tau, impl="soa"))()

    assert jnp.allclose(a_ref, a_soa, rtol=2e-4, atol=2e-3), (a_ref, a_soa)
    assert jnp.allclose(q_ref, q_soa, rtol=2e-4, atol=2e-2)
    assert jnp.allclose(i_ref["foot_pos_world"], i_soa["foot_pos_world"],
                        atol=1e-5)
    assert jnp.allclose(i_ref["foot_vel_world"], i_soa["foot_vel_world"],
                        atol=1e-4)
    assert jnp.allclose(i_ref["foot_forces"], i_soa["foot_forces"],
                        rtol=1e-4, atol=1e-2)
    assert jnp.array_equal(i_ref["feet_in_contact"], i_soa["feet_in_contact"])
    assert bool(i_ref["invalid_contact"]) == bool(i_soa["invalid_contact"])


def test_soa_matches_ref_randomized_model_and_ext_force():
    cfg = go1_config(True)
    scen = rnd.sample_scenario(cfg, "TEST_RANDOMIZER", jax.random.PRNGKey(3))
    model = rnd.model_from_params(scen)
    params = dyn.default_sim_params().replace(friction=scen.friction)
    state = _random_state(jax.random.PRNGKey(11), 0.28)
    tau = 3.0 * jax.random.normal(jax.random.PRNGKey(5), (12,))
    f_ext = jnp.array([20.0, -10.0, 5.0])

    a_ref, q_ref, _ = dyn.forward_dynamics(model, params, state, tau,
                                           f_ext, impl="ref")
    a_soa, q_soa, _ = dyn.forward_dynamics(model, params, state, tau,
                                           f_ext, impl="soa")
    assert jnp.allclose(a_ref, a_soa, rtol=2e-4, atol=2e-3)
    assert jnp.allclose(q_ref, q_soa, rtol=2e-4, atol=2e-2)


def test_soa_on_rack():
    model = build_model()
    params = dyn.default_sim_params(on_rack=True)
    state = _random_state(jax.random.PRNGKey(2), 1.0)
    tau = jnp.ones(12)
    a_ref, q_ref, _ = dyn.forward_dynamics(model, params, state, tau, impl="ref")
    a_soa, q_soa, _ = dyn.forward_dynamics(model, params, state, tau, impl="soa")
    assert jnp.allclose(a_soa, 0.0)
    assert jnp.allclose(q_ref, q_soa, rtol=2e-4, atol=2e-2)


def test_soa_jacobians_match_ref():
    """The iLQR solver differentiates through the step; tangents must agree."""
    model = build_model()
    params = dyn.default_sim_params()
    cfg = go1_config(True)
    state = dyn.RobotState(
        pos=jnp.array([0.0, 0.0, 0.3]),
        quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
        lin_vel=jnp.zeros(3), ang_vel=jnp.zeros(3),
        q=cfg.init_joint_angles, qd=jnp.zeros(12))

    def qdd_of_q(q, impl):
        s = state.replace(q=q)
        _, qdd, _ = dyn.forward_dynamics(model, params, s, jnp.zeros(12),
                                         impl=impl)
        return qdd

    J_ref = jax.jacfwd(lambda q: qdd_of_q(q, "ref"))(cfg.init_joint_angles)
    J_soa = jax.jacfwd(lambda q: qdd_of_q(q, "soa"))(cfg.init_joint_angles)
    assert jnp.allclose(J_ref, J_soa, rtol=1e-3, atol=0.5), (
        float(jnp.max(jnp.abs(J_ref - J_soa))))
