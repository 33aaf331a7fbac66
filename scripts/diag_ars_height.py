"""Push the ARS jump apex past the ~0.55 m plateau (fine-tune economics
flip positive around 0.6: the dense reward's flight surplus must out-pay
the crouch/transient deficits — measured in diag_economics /
diag_e2e_v2). Torque-limit arithmetic puts the physical ceiling around
0.8 m, so the plateau is a search problem, not physics: continue from
the cached expert with doubled direction count and finer steps.

Usage: python scripts/diag_ars_height.py --cpu [--iters 150]
Updates /tmp/ars_expert.npz in place when it finds a better apex.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--iters", type=int, default=150)
ap.add_argument("--n-directions", type=int, default=16)
ap.add_argument("--step-size", type=float, default=0.02)
ap.add_argument("--delta-std", type=float, default=0.03)
ap.add_argument("--no-filter", action="store_true",
                help="train without the 3 Hz action filter (the filter "
                "smears the ~0.15 s launch thrust; exact-state BC does "
                "not need a smooth demo)")
ap.add_argument("--out", default="/tmp/ars_expert.npz")
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.train import normalize as vnorm
from quadruped_springs_tpu.train.ars import ARSConfig, ARSTrainer

z = np.load("/tmp/ars_expert.npz")

env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=1.0,
    enable_action_filter=not args.no_filter))
ars = ARSTrainer(env, ARSConfig(
    n_directions=args.n_directions, top_directions=args.n_directions // 2,
    episode_steps=110, reset_bank_size=8, step_size=args.step_size,
    delta_std=args.delta_std))
ts = ars.init(jax.random.PRNGKey(3))
ts = ts.replace(W=jnp.asarray(z["W"]),
                obs_norm=vnorm.RunningNorm(
                    jnp.asarray(z["mean"]), jnp.asarray(z["var"]),
                    jnp.asarray(z["count"])))

best_apex = float(z["apex"])
best = None
print(f"start from apex {best_apex:.3f}")
for i in range(args.iters):
    ts, m = ars.train_step(ts)
    ev = ars.evaluate(ts, n_episodes=4)
    apex = float(ev["max_height"])
    if apex > best_apex:
        best_apex, best = apex, (ts.W, ts.obs_norm)
    if i % 10 == 9:
        print(f"[height {i:03d}] eval {float(ev['return_mean']):+.3f} "
              f"apex {apex:.3f} (best {best_apex:.3f})", flush=True)

if best is not None:
    W, on = best
    np.savez(args.out, W=np.asarray(W), mean=np.asarray(on.mean),
             var=np.asarray(on.var), count=np.asarray(on.count),
             apex=best_apex)
    print(f"updated cache: apex {best_apex:.3f}")
else:
    print("no improvement; cache unchanged")
