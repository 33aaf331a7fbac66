"""MPC problem assembly: Go1 control-rate dynamics + task costs + iLQR.

Ties together the analytic dynamics (models/dynamics.py), the control
interfaces (control/interfaces.py) and the task cost models
(tasks/costs.py) into the batched trajectory-optimization engine that is
this framework's flagship model (BASELINE.json: vmapped iLQR at H=50 over
the 100 Hz control-rate dynamics, warm-started from CPG/demo references).

State vector layout (n=37):
  [pos(3), quat(4), lin_vel(3), ang_vel(3), q(12), qd(12)]
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from quadruped_springs_tpu.control import interfaces as ci
from quadruped_springs_tpu.env import randomizers as rnd
from quadruped_springs_tpu.models import dynamics as dyn
from quadruped_springs_tpu.models.go1_params import go1_config
from quadruped_springs_tpu.ops import actuation as act
from quadruped_springs_tpu.solver import ilqr, mppi
from quadruped_springs_tpu.tasks import costs as task_costs

N_STATE = 37


def _apply_with_scen(fn, scenarios, X, U):
    """Close batched scenarios over a (X, U, scenarios) vmapped dynamics."""
    return fn(X, U, scenarios)


def state_to_vec(s: dyn.RobotState) -> jnp.ndarray:
    return jnp.concatenate([s.pos, s.quat, s.lin_vel, s.ang_vel, s.q, s.qd])


def vec_to_state(x: jnp.ndarray) -> dyn.RobotState:
    return dyn.RobotState(
        pos=x[0:3], quat=x[3:7], lin_vel=x[7:10], ang_vel=x[10:13],
        q=x[13:25], qd=x[25:37])


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    task: str = "JUMPING_IN_PLACE"
    enable_springs: bool = True
    motor_control_mode: str = "PD"
    action_space_mode: str = "SYMMETRIC"
    horizon: int = 50
    action_repeat: int = 10       # 1 kHz substeps per 100 Hz knot (execution)
    time_step: float = 0.001
    iterations: int = 10
    n_alphas: int = 8
    # Riccati sweep: "sequential" or "parallel" (associative-scan
    # parallel-in-time — see solver/ilqr.py ILQRConfig.backward).
    backward: str = "sequential"
    # iLQR perf knobs (see ILQRConfig): relinearize every k-th iteration /
    # scan unroll factor for the backward+forward sweeps.
    relin_every: int = 1
    ilqr_unroll: int = 1
    # dtype for the A/B Jacobian sweep ONLY ("f32" or "bf16"): the
    # 43-tangent linearization dominates iLQR iteration FLOPs; rollouts,
    # cost ranking, and the Riccati recursion stay f32 (see
    # ilqr.solve(dynamics_lin=...)).
    lin_dtype: str = "f32"
    # Planner integration rate: the solver's internal dynamics may integrate
    # coarser than the 1 kHz execution rate. The TPU cost of a solve is
    # dominated by *sequential* substeps (dispatch latency, not FLOPs), so
    # planning at 200 Hz (2 substeps per 100 Hz knot, dt=5 ms — stable for
    # the relaxed contact below) is ~5x faster per iteration.
    solver_substeps: int = 2
    # Planning uses a relaxed contact model: the evaluation stiffness
    # (30 kN/m) makes the control-step Jacobians so stiff that the Riccati
    # recursion overflows f32. Softer contact for the *planner* is standard
    # practice (gradients stay informative; execution still uses the stiff
    # simulator).
    # damping is capped by the integrator: dt·d/m_eff < 1 (m_eff ≈ 0.2 kg
    # foot+calf), so 5 ms planner steps need d ≲ 40.
    contact_stiffness: float = 4000.0
    contact_damping: float = 40.0
    # Task-cost parameter overrides as a hashable (key, value) tuple, e.g.
    # (("v_ref", 1.8),) — consumed by tasks/costs.make_cost; the supported
    # keys are documented per task there. Empty = the committed defaults.
    cost_overrides: tuple = ()
    # Impact-damping clamp (SimParams.clamp_damping): required on the stiff
    # execution model, optional on the relaxed planner (off = ~1.8x faster).
    clamp_damping: bool = False
    # Action-interface task override: the control interface's action
    # scaling is task-dependent (BACKFLIP raises the rear-thigh upper
    # limits — control/interfaces.py, reference motor_interface.py:20-22),
    # so a solver planning a DIFFERENT cost inside a backflip episode
    # (e.g. task="RECOVERY" get-up demos) must still emit actions in the
    # episode's action semantics. None = same as `task`.
    iface_task: str | None = None
    # lax.scan unroll factor for the 1 kHz substep loop inside one planner
    # knot — a full-rate (10-substep) perf knob; measure before trusting
    # (XLA schedule luck: unroll hurt the iLQR sweeps, memory shows).
    substep_unroll: int = 1

    @classmethod
    def full_rate(cls, **kw) -> "MPCConfig":
        """Execution-rate planner: 10x1 ms substeps with the execution
        contact constants — kn=180 kN/m, dn=100 N s/m, damping clamp on —
        i.e. the SimParams `models/dynamics.default_sim_params` gives the
        1 kHz simulator (env/env.py). One disclosed gap remains: the
        planner is memoryless, so feet use the viscous-regularized
        friction cone instead of the executor's anchor-spring stiction
        state (SimParams.tangential_* notes). ~5x more sequential substeps
        per knot; use for sampling solvers (MPPI) or honest full-rate
        benchmarks.
        """
        kw.setdefault("solver_substeps", 10)
        kw.setdefault("contact_stiffness", 180000.0)
        kw.setdefault("contact_damping", 100.0)
        kw.setdefault("clamp_damping", True)
        return cls(**kw)

    @property
    def planner_desc(self) -> str:
        """Honest one-token description of the planner model for bench
        metric strings, e.g. 'planner@200Hz-4kN' or 'planner@1kHz-30kN'."""
        hz = int(round(self.solver_substeps / (self.time_step
                                               * self.action_repeat)))
        return (f"planner@{hz}Hz-{self.contact_stiffness / 1000:g}kN"
                + ("" if self.clamp_damping else "-relaxed"))


class MPCProblem:
    """Static problem definition; exposes pure dynamics/cost/solve fns."""

    def __init__(self, config: MPCConfig = MPCConfig()):
        self.config = config
        self.cfg = go1_config(config.enable_springs)
        self.iface = ci.make_interface(
            self.cfg, config.motor_control_mode, config.action_space_mode,
            config.iface_task or config.task)
        self.action_dim = self.iface.action_dim
        knot_dt = config.time_step * config.action_repeat
        self.sim_params = dyn.default_sim_params(
            knot_dt / config.solver_substeps).replace(
            contact_stiffness=jnp.asarray(config.contact_stiffness),
            contact_damping=jnp.asarray(config.contact_damping),
            # relaxed planner contact doesn't need the impact-damping clamp
            # (see SimParams.clamp_damping) and solves ~1.8x faster without;
            # MPCConfig.full_rate() turns it back on.
            clamp_damping=config.clamp_damping)
        self.stage_cost, self.terminal_cost = task_costs.make_cost(
            config.task, self.cfg, self.action_dim, config.horizon,
            overrides=dict(config.cost_overrides))
        self.ilqr_config = ilqr.ILQRConfig(
            horizon=config.horizon, iterations=config.iterations,
            n_alphas=config.n_alphas, backward=config.backward,
            relin_every=config.relin_every, unroll=config.ilqr_unroll)

    # -- dynamics: one 100 Hz control knot = action_repeat 1 kHz substeps --
    def dynamics(self, x: jnp.ndarray, u: jnp.ndarray,
                 scenario: rnd.ScenarioParams | None = None,
                 dtype=None) -> jnp.ndarray:
        """One planner knot. With `dtype` (e.g. jnp.bfloat16) every model
        constant, state, and intermediate is cast so the whole knot
        computes in that precision (returns f32) — the reduced-precision
        linearization path (MPCConfig.lin_dtype)."""
        cast = (lambda t: t) if dtype is None else (
            lambda t: jax.tree.map(
                lambda a: a.astype(dtype)
                if (hasattr(a, "dtype")
                    and jnp.issubdtype(a.dtype, jnp.floating)) else a, t))
        cfg = cast(self.cfg)
        iface = cast(self.iface)
        scenario = rnd.nominal_params(self.cfg) if scenario is None else scenario
        scenario = cast(scenario)
        model = cast(rnd.model_from_params(scenario))
        params = cast(self.sim_params.replace(friction=scenario.friction))
        u = u if dtype is None else u.astype(dtype)
        q_des = ci.action_to_command(iface, u)

        def substep(s, _):
            tau_m = act.pd_torque(q_des, s.q, s.qd, cfg.motor_kp, cfg.motor_kd,
                                  cfg.torque_limits)
            if cfg.enable_springs:
                tau_m = tau_m + act.spring_torque(
                    s.q, s.qd, scenario.spring_stiffness,
                    scenario.spring_damping, cfg.spring_rest_angles)
            # reduced precision forces the scalarized impl: it is pure
            # arithmetic (hand-written 3x3/6x6 solves), while the
            # structured path's jnp.linalg has no bf16 kernels on CPU
            s2, _ = dyn.step(model, params, s, tau_m, cfg.velocity_limits,
                             impl="soa" if dtype is not None else None)
            # some shared module constants are f32 (e.g. joint-limit
            # tables): re-cast so the scan carry dtype stays put
            return cast(s2), None

        s, _ = jax.lax.scan(substep, cast(vec_to_state(x)), None,
                            length=self.config.solver_substeps,
                            unroll=self.config.substep_unroll)
        out = state_to_vec(s)
        return out if dtype is None else out.astype(x.dtype)

    # -- solve ------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def solve(self, x0: jnp.ndarray, u_init: jnp.ndarray,
              scenario: rnd.ScenarioParams | None = None) -> ilqr.ILQRSolution:
        dyn_fn = lambda x, u: self.dynamics(x, u, scenario)
        dyn_lin = None
        if self.config.lin_dtype == "bf16":
            dyn_lin = lambda x, u: self.dynamics(x, u, scenario,
                                                 dtype=jnp.bfloat16)
        return ilqr.solve(dyn_fn, self.stage_cost, self.terminal_cost,
                          x0, u_init, self.ilqr_config,
                          dynamics_lin=dyn_lin)

    @partial(jax.jit, static_argnums=(0, 4), static_argnames=("config",))
    def solve_mppi(self, x0: jnp.ndarray, u_init: jnp.ndarray, key,
                   config: mppi.MPPIConfig | None = None,
                   scenario: rnd.ScenarioParams | None = None):
        """Sampling-based solve (solver/mppi.py) on the same dynamics/costs.

        MPPI needs no derivatives, so it plans on this problem's dynamics
        as-is — including through clips/one-sided springs — and batches the
        same way as iLQR (vmap over scenarios, shard_map over meshes).
        The planner model is whatever MPCConfig specifies (default: the
        relaxed 200 Hz model shared with iLQR; MPCConfig.full_rate() for
        the execution-rate stiff model).
        """
        if config is None:
            config = mppi.MPPIConfig(horizon=self.config.horizon,
                                     iterations=self.config.iterations)
        dyn_fn = lambda x, u: self.dynamics(x, u, scenario)
        dyn_sample = None
        if config.sample_dtype == "bf16":
            dyn_sample = lambda x, u: self.dynamics(x, u, scenario,
                                                    dtype=jnp.bfloat16)
        return mppi.solve(dyn_fn, self.stage_cost, self.terminal_cost,
                          x0, u_init, key, config,
                          dynamics_sample=dyn_sample)

    @partial(jax.jit, static_argnums=0)
    def solve_batch(self, x0s: jnp.ndarray, u_inits: jnp.ndarray,
                    scenarios: rnd.ScenarioParams | None = None):
        """Scenario-batched solve: the 'VecEnv' of this framework.

        Uses the batch-explicit solver (ilqr.solve_batched) — the
        linearization keeps the BATCH on the TPU lane axis instead of the
        43 tangents (34% lane utilization under plain vmap(solve); see
        solve_batched's docstring). vmap(self.solve) remains available for
        odd batch shapes / composition with other transforms.
        """
        if scenarios is None:
            dyn_b = jax.vmap(lambda x, u: self.dynamics(x, u))
            dyn_lin_b = (jax.vmap(
                lambda x, u: self.dynamics(x, u, dtype=jnp.bfloat16))
                if self.config.lin_dtype == "bf16" else None)
        else:
            dyn_b = jax.vmap(lambda x, u, s: self.dynamics(x, u, s),
                             in_axes=(0, 0, 0))
            dyn_b = partial(_apply_with_scen, dyn_b, scenarios)
            if self.config.lin_dtype == "bf16":
                d16 = jax.vmap(
                    lambda x, u, s: self.dynamics(x, u, s,
                                                  dtype=jnp.bfloat16),
                    in_axes=(0, 0, 0))
                dyn_lin_b = partial(_apply_with_scen, d16, scenarios)
            else:
                dyn_lin_b = None
        return ilqr.solve_batched(
            dyn_b, self.stage_cost, self.terminal_cost, x0s, u_inits,
            self.ilqr_config, dynamics_lin_b=dyn_lin_b)

    # -- receding-horizon step (continuous jumping MPC) --------------------
    @partial(jax.jit, static_argnums=0)
    def mpc_step(self, x0: jnp.ndarray, u_warm: jnp.ndarray,
                 scenario: rnd.ScenarioParams | None = None):
        """Solve, apply the first control, shift the plan (warm start)."""
        sol = self.solve(x0, u_warm, scenario)
        x1 = self.dynamics(x0, sol.us[0], scenario)
        u_next = jnp.concatenate([sol.us[1:], sol.us[-1:]], axis=0)
        return x1, sol.us[0], u_next, sol.cost

    # -- convenience -------------------------------------------------------
    def default_x0(self) -> jnp.ndarray:
        return state_to_vec(dyn.RobotState(
            pos=self.cfg.init_position,
            quat=jnp.array([0.0, 0.0, 0.0, 1.0]),
            lin_vel=jnp.zeros(3), ang_vel=jnp.zeros(3),
            q=self.cfg.init_joint_angles, qd=jnp.zeros(12)))

    def default_warm_start(self) -> jnp.ndarray:
        a0 = ci.command_to_action(self.iface, self.iface.init_pose)
        return jnp.broadcast_to(a0, (self.config.horizon, self.action_dim))

    def task_warm_start(self, crouch_knots: int | None = None) -> jnp.ndarray:
        """Task-shaped warm start. Warm starts dominate solution quality for
        these stiff-contact problems (hence the reference's CPG / demo
        seeding, SURVEY §7); a crouch-extend primitive puts jumping tasks in
        the right basin immediately.
        """
        H = self.config.horizon
        task = self.config.task
        if crouch_knots is None:
            crouch_knots = max(H // 3, 4)
        hold = self.default_warm_start()
        if self.config.action_space_mode != "SYMMETRIC":
            return hold
        if "JUMPING" in task or "BACKFLIP" in task:
            crouch = jnp.array([0.0, 0.4, -0.8, 0.0, 0.4, -0.8])
            extend = jnp.array([0.0, -0.4, 1.0, 0.0, -0.4, 1.0])
            if task.startswith("BACKFLIP"):
                # rear legs extend later -> pitch-back rotation
                extend = jnp.array([0.0, -0.2, 0.6, 0.0, -0.6, 1.0])
            ramp = (jnp.arange(H) < crouch_knots)[:, None]
            return jnp.where(ramp, crouch, extend)
        return hold
