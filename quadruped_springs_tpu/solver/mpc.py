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
    # Impact-damping clamp (SimParams.clamp_damping): required on the stiff
    # execution model, optional on the relaxed planner (off = ~1.8x faster).
    clamp_damping: bool = False

    @classmethod
    def full_rate(cls, **kw) -> "MPCConfig":
        """Execution-rate planner: 10x1 ms substeps, 30 kN/m contact, clamp
        on — the planner integrates the SAME model the 1 kHz simulator runs
        (env/env.py), no relaxation. ~5x more sequential substeps per knot;
        use for sampling solvers (MPPI) or honest full-rate benchmarks.
        """
        kw.setdefault("solver_substeps", 10)
        kw.setdefault("contact_stiffness", 30000.0)
        kw.setdefault("contact_damping", 600.0)
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
            config.task)
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
            config.task, self.cfg, self.action_dim, config.horizon)
        self.ilqr_config = ilqr.ILQRConfig(
            horizon=config.horizon, iterations=config.iterations,
            n_alphas=config.n_alphas, backward=config.backward,
            relin_every=config.relin_every, unroll=config.ilqr_unroll)

    # -- dynamics: one 100 Hz control knot = action_repeat 1 kHz substeps --
    def dynamics(self, x: jnp.ndarray, u: jnp.ndarray,
                 scenario: rnd.ScenarioParams | None = None) -> jnp.ndarray:
        cfg = self.cfg
        scenario = rnd.nominal_params(cfg) if scenario is None else scenario
        model = rnd.model_from_params(scenario)
        params = self.sim_params.replace(friction=scenario.friction)
        q_des = ci.action_to_command(self.iface, u)

        def substep(s, _):
            tau_m = act.pd_torque(q_des, s.q, s.qd, cfg.motor_kp, cfg.motor_kd,
                                  cfg.torque_limits)
            if cfg.enable_springs:
                tau_m = tau_m + act.spring_torque(
                    s.q, s.qd, scenario.spring_stiffness,
                    scenario.spring_damping, cfg.spring_rest_angles)
            s2, _ = dyn.step(model, params, s, tau_m, cfg.velocity_limits)
            return s2, None

        s, _ = jax.lax.scan(substep, vec_to_state(x), None,
                            length=self.config.solver_substeps)
        return state_to_vec(s)

    # -- solve ------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def solve(self, x0: jnp.ndarray, u_init: jnp.ndarray,
              scenario: rnd.ScenarioParams | None = None) -> ilqr.ILQRSolution:
        dyn_fn = lambda x, u: self.dynamics(x, u, scenario)
        return ilqr.solve(dyn_fn, self.stage_cost, self.terminal_cost,
                          x0, u_init, self.ilqr_config)

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
        return mppi.solve(dyn_fn, self.stage_cost, self.terminal_cost,
                          x0, u_init, key, config)

    @partial(jax.jit, static_argnums=0)
    def solve_batch(self, x0s: jnp.ndarray, u_inits: jnp.ndarray,
                    scenarios: rnd.ScenarioParams | None = None):
        """vmapped scenario-batched solve: the 'VecEnv' of this framework."""
        if scenarios is None:
            return jax.vmap(lambda x, u: self.solve(x, u))(x0s, u_inits)
        return jax.vmap(self.solve)(x0s, u_inits, scenarios)

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
