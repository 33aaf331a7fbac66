"""Feasibility: can MPPI discover the backflip get-up the local methods can't?

scripts/diag_backflip_robust.py measured that on every failing held-out
scenario the MLP lander's FINAL pose equals its HANDOFF pose — "hold
still" is a local optimum that ARS perturbations (attempt 4) and BPTT
analytic gradients (attempt 5) both fail to escape: righting from
up_z 0.3-0.8 is a discrete multi-step maneuver whose first steps score
worse. MPPI is a global sampling solver, so it has no such trap. This
script takes the HARDEST touchdown states from the cached training bank
(lowest up_z), runs receding-horizon MPPI on the new RECOVERY cost
(tasks/costs.py) planning on each state's OWN randomized scenario
(EnvState.scenario), executes on the stiff env.step, and reports whether
the strict upright bar (up_z>0.85, z>0.15) is reached.

If this passes, the recoveries become get-up demonstrations the MLP is
behavior-cloned on (the repo's two-stage methodology applied to the
lander itself).

Usage: python scripts/diag_recovery_mppi.py [--cpu] [--n-hard 4]
           [--bank /tmp/backflip_bank96.npz]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--bank", default="/tmp/backflip_bank96.npz")
ap.add_argument("--n-hard", type=int, default=4)
ap.add_argument("--horizon", type=int, default=25)
ap.add_argument("--iters", type=int, default=8)
ap.add_argument("--n-samples", type=int, default=128)
ap.add_argument("--replan-every", type=int, default=2)
ap.add_argument("--steps", type=int, default=100,
                help="control knots to run (matches the ~1 s the deployed "
                     "lander has before the episode ends)")
ap.add_argument("--full-rate", action="store_true",
                help="plan on the execution-rate stiff model "
                     "(MPCConfig.full_rate) — the catch happens inside one "
                     "10 ms knot, which the relaxed 200 Hz planner "
                     "under-resolves")
ap.add_argument("--catch-knots", type=int, default=10,
                help="initial knots with replan-every-1 and a deeper solve "
                     "(the invalid-contact window)")
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.models import spatial as sp
from quadruped_springs_tpu.solver.mpc import MPCConfig, MPCProblem, state_to_vec
from quadruped_springs_tpu.solver.mppi import MPPIConfig

env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="BACKFLIP",
    observation_space_mode="ARS_BACKFLIP", action_space_mode="SYMMETRIC",
    obs_noise=True, max_ep_len=4.0, env_randomizer_mode="TEST_RANDOMIZER"))

z = np.load(args.bank)
template, _ = env.reset(jax.random.PRNGKey(0))
treedef = jax.tree.structure(template)
leaves = [jnp.asarray(z[f"leaf{i}"]) for i in range(int(z["n_leaves"]))]
bank = jax.tree.unflatten(treedef, leaves)
n_bank = int(z["obs"].shape[0])

# hardest touchdowns = lowest up_z at handoff
up_zs = np.array([float(sp.quat_to_mat(bank.robot.quat[i])[2, 2])
                  for i in range(n_bank)])
hard_idx = np.argsort(up_zs)[:args.n_hard]
print(f"bank up_z range [{up_zs.min():.2f}, {up_zs.max():.2f}]; "
      f"hardest {args.n_hard}: {[round(float(up_zs[i]), 2) for i in hard_idx]}",
      flush=True)

mk = MPCConfig.full_rate if args.full_rate else MPCConfig
prob = MPCProblem(mk(task="RECOVERY", iface_task="BACKFLIP",
                     horizon=args.horizon, iterations=args.iters))
mcfg = MPPIConfig(horizon=args.horizon, iterations=args.iters,
                  n_samples=args.n_samples, fused_accept=True)
# deeper solve inside the catch window (first action decides whether the
# knee strikes ground within the first 10 ms knot)
mcfg_catch = MPPIConfig(horizon=args.horizon, iterations=2 * args.iters,
                        n_samples=args.n_samples, fused_accept=True)


def recover(state, seed):
    """Receding-horizon MPPI from one touchdown EnvState, executed on the
    stiff env (which carries the state's own randomized scenario)."""
    u_warm = jnp.broadcast_to(jnp.asarray(env.get_landing_action()),
                              (args.horizon, 6))
    key = jax.random.PRNGKey(seed)
    traj = []
    for t in range(args.steps):
        in_catch = t < args.catch_knots
        if in_catch or t % args.replan_every == 0:
            key, k = jax.random.split(key)
            x = state_to_vec(state.robot)
            sol = prob.solve_mppi(x, u_warm, k,
                                  mcfg_catch if in_catch else mcfg,
                                  state.scenario)
            u_warm = sol.us
        a = u_warm[0]
        u_warm = jnp.concatenate([u_warm[1:], u_warm[-1:]], axis=0)
        state, obs, r, d, info = env.step(state, a)
        R = np.asarray(sp.quat_to_mat(state.robot.quat))
        traj.append((float(R[2, 2]), float(state.robot.pos[2]), bool(d)))
        if bool(d):
            break
    return state, traj


for j, i in enumerate(hard_idx):
    st0 = jax.tree.map(lambda a: a[i], bank)
    st, traj = recover(st0, 100 + j)
    R = np.asarray(sp.quat_to_mat(st.robot.quat))
    up_f, z_f = float(R[2, 2]), float(st.robot.pos[2])
    done = traj[-1][2]
    # first knot at which the strict bar held
    t_up = next((t for t, (u, zz, _) in enumerate(traj)
                 if u > 0.85 and zz > 0.15), -1)
    print(f"state {i}: handoff up_z {up_zs[i]:+.2f} -> final up_z {up_f:+.2f} "
          f"z {z_f:.2f} done={done} first_upright_knot={t_up} "
          f"{'RECOVERED' if up_f > 0.85 and z_f > 0.15 and not done else 'FAIL'}",
          flush=True)
