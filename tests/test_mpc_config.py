"""MPCConfig surface: the execution-rate planner constructor and the
honest bench metric strings (no compilation — pure construction)."""

import jax.numpy as jnp

from quadruped_springs_tpu.models import dynamics as dyn
from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem


def test_full_rate_matches_execution_model():
    cfg = MPCConfig.full_rate(task="BACKFLIP", horizon=50, iterations=10)
    # 10x1 ms substeps + the execution contact constants — the same
    # SimParams models/dynamics.default_sim_params gives the 1 kHz
    # simulator (kn=180 kN/m, dn=100, clamp on). The one remaining
    # (disclosed) planner/executor gap is anchor-spring stiction, which
    # needs the executor's foot_anchor state.
    exe = dyn.default_sim_params()
    assert cfg.solver_substeps == 10
    assert cfg.contact_stiffness == float(exe.contact_stiffness)
    assert cfg.contact_damping == float(exe.contact_damping)
    assert cfg.clamp_damping is exe.clamp_damping
    assert cfg.task == "BACKFLIP" and cfg.horizon == 50


def test_full_rate_problem_sim_params_match_execution():
    # the constructed problem's SimParams equal the executor's except dt
    prob = MPCProblem(MPCConfig.full_rate())
    exe = dyn.default_sim_params()
    assert prob.sim_params.dt == 0.001
    assert jnp.allclose(prob.sim_params.contact_stiffness,
                        exe.contact_stiffness)
    assert jnp.allclose(prob.sim_params.contact_damping, exe.contact_damping)
    assert prob.sim_params.clamp_damping is exe.clamp_damping
    assert jnp.allclose(prob.sim_params.tangential_stiffness,
                        exe.tangential_stiffness)


def test_planner_desc_discloses_rate_and_relaxation():
    relaxed = MPCConfig()
    assert relaxed.planner_desc == "planner@200Hz-4kN-relaxed"
    full = MPCConfig.full_rate()
    assert full.planner_desc == "planner@1000Hz-180kN"


def test_full_rate_overrides_compose():
    cfg = MPCConfig.full_rate(solver_substeps=5)
    assert cfg.solver_substeps == 5            # explicit override wins
    assert cfg.contact_stiffness == 180000.0   # defaults still applied
