"""Closed-loop (receding-horizon) MPC on the stiff 1 kHz simulator.

The production loop this framework is built for: each 100 Hz control knot,
solve (or re-warm) the iLQR problem on the relaxed planner model, apply
the first control to the *stiff execution-rate* simulator, shift the plan.
Planner/execution model mismatch is absorbed by feedback re-planning.

`--full-rate` runs the round-5 no-transfer-gap configuration instead:
MPPI planning directly ON the execution-rate stiff model
(MPCConfig.full_rate(), H=25 — the same 0.25 s window the relaxed H=50
headline spans; bench row `bench.py --full-rate --horizon 25`, 603.8
solves/s/chip = 0.97x the north star). Planner and executor share the
contact constants, so there is no planner->executor model gap for
feedback to absorb; the planner remains memoryless (no stiction
anchors — disclosed at MPCConfig.full_rate).

Usage: python examples/run_closed_loop_mpc.py [--cpu] [--steps N]
       [--replan-every K] [--full-rate]
"""

import sys

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.control import interfaces as ci
from quadruped_springs_tpu.env import randomizers as rnd
from quadruped_springs_tpu.models import dynamics as dyn
from quadruped_springs_tpu.ops import actuation as act
from quadruped_springs_tpu.solver.mpc import (
    MPCConfig,
    MPCProblem,
    state_to_vec,
    vec_to_state,
)


_G9 = 9.81


def run(n_steps: int = 40, replan_every: int = 5, verbose: bool = True,
        full_rate: bool = False):
    """Receding-horizon loop; returns closed-loop transfer metrics
    (consumed by tests/test_transfer.py's closed-loop case; the
    full_rate variant by tests/test_transfer.py's no-gap case)."""
    if full_rate:
        prob = MPCProblem(MPCConfig.full_rate(
            task="JUMPING_IN_PLACE", horizon=25, iterations=4))
        from quadruped_springs_tpu.solver.mppi import MPPIConfig
        mcfg = MPPIConfig(horizon=25, iterations=4, n_samples=32,
                          fused_accept=True)
        solve_keys = jax.random.split(jax.random.PRNGKey(3), n_steps)
    else:
        prob = MPCProblem(MPCConfig(task="JUMPING_IN_PLACE", horizon=20,
                                    iterations=4, n_alphas=4))
    c = prob.cfg
    scen = rnd.nominal_params(c)
    model = rnd.model_from_params(scen)
    exec_params = dyn.default_sim_params(0.001)

    @jax.jit
    def execute_knot(state, action):
        """One 100 Hz knot on the stiff simulator (10 x 1 kHz substeps)."""
        q_des = ci.action_to_command(prob.iface, action)

        def sub(s, _):
            tau = act.pd_torque(q_des, s.q, s.qd, c.motor_kp, c.motor_kd,
                                c.torque_limits)
            tau = tau + act.spring_torque(
                s.q, s.qd, scen.spring_stiffness, scen.spring_damping,
                c.spring_rest_angles)
            s2, _ = dyn.step(model, exec_params, s, tau, c.velocity_limits)
            return s2, None

        s, _ = jax.lax.scan(sub, state, None, length=10)
        return s

    def ballistic_apex_of(xs):
        z, vz = xs[:, 2], xs[:, 9]
        return float(jnp.max(z + jnp.maximum(vz, 0.0) ** 2 / (2 * _G9)))

    state = vec_to_state(prob.default_x0())
    u_warm = prob.task_warm_start(crouch_knots=6)
    zs, apex, planned_apexes = [], 0.0, []
    for t in range(n_steps):
        x = state_to_vec(state)
        if t % replan_every == 0:
            if full_rate:
                sol = prob.solve_mppi(x, u_warm, solve_keys[t], mcfg)
            else:
                sol = prob.solve(x, u_warm)
            u_warm = sol.us
            # each solve's predicted (ballistic) apex on the relaxed
            # planner model — the closed-loop transfer yardstick is the
            # max prediction vs the stiff executor's realized apex
            planned_apexes.append(ballistic_apex_of(sol.xs))
        action = u_warm[0]
        u_warm = jnp.concatenate([u_warm[1:], u_warm[-1:]], axis=0)
        state = execute_knot(state, action)
        z = float(state.pos[2])
        vz = float(state.lin_vel[2])
        apex = max(apex, z + max(vz, 0.0) ** 2 / (2 * _G9))
        zs.append(z)

    zs = np.asarray(zs)
    out = {
        "planned_apex_max_m": round(max(planned_apexes), 3),
        "planned_apex_first_m": round(planned_apexes[0], 3),
        "executed_apex_m": round(apex, 3),
        "final_z_m": round(float(zs[-1]), 3),
        "upright": bool(zs[-1] > 0.15),
    }
    if verbose:
        print(f"closed-loop MPC, {n_steps} knots @100 Hz "
              f"(replan every {replan_every}, "
              f"planner: {prob.config.planner_desc}):")
        print(f"  planned apex (max over solves): {out['planned_apex_max_m']:.3f} m")
        print(f"  executed apex (stiff sim): {apex:.3f} m")
        print(f"  height range: [{zs.min():.3f}, {zs.max():.3f}] m")
        print(f"  final height: {zs[-1]:.3f} m, upright: {out['upright']}")
    return out


def main():
    n_steps = 40
    if "--steps" in sys.argv:
        n_steps = int(sys.argv[sys.argv.index("--steps") + 1])
    replan_every = 5
    if "--replan-every" in sys.argv:
        replan_every = int(sys.argv[sys.argv.index("--replan-every") + 1])
    run(n_steps, replan_every, full_rate="--full-rate" in sys.argv)


if __name__ == "__main__":
    main()
