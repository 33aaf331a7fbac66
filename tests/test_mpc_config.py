"""MPCConfig surface: the execution-rate planner constructor and the
honest bench metric strings (no compilation — pure construction)."""

from quadruped_springs_tpu.solver.mpc import MPCConfig


def test_full_rate_matches_execution_model():
    cfg = MPCConfig.full_rate(task="BACKFLIP", horizon=50, iterations=10)
    # 10x1 ms substeps, 30 kN/m, damping clamp on — the 1 kHz simulator's
    # contact model (models/dynamics.default_sim_params)
    assert cfg.solver_substeps == 10
    assert cfg.contact_stiffness == 30000.0
    assert cfg.clamp_damping is True
    assert cfg.task == "BACKFLIP" and cfg.horizon == 50


def test_planner_desc_discloses_rate_and_relaxation():
    relaxed = MPCConfig()
    assert relaxed.planner_desc == "planner@200Hz-4kN-relaxed"
    full = MPCConfig.full_rate()
    assert full.planner_desc == "planner@1000Hz-30kN"


def test_full_rate_overrides_compose():
    cfg = MPCConfig.full_rate(solver_substeps=5)
    assert cfg.solver_substeps == 5           # explicit override wins
    assert cfg.contact_stiffness == 30000.0   # defaults still applied
