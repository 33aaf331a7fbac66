"""Stage-1b: continue ARS from the cached 1.0 s expert with episodes
long enough (1.9 s) that the sparse task's terminal alive-bonus /
crash-penalty margin pays for LANDING the jump and holding stance.

Every pose-hold landing autopilot tips over on the PEA re-hop's
asymmetric second touchdown in ~all randomized scenarios
(scripts/diag_bc_multi.py: 8/8 demos terminate at ~1.44 s); landing
needs state feedback, so it must live in the policy. The 1.0 s training
episodes ended at touchdown, so the expert never paid for what happens
after — longer episodes close exactly that gap.

Usage: python scripts/diag_ars_land.py --cpu [--iters 120]
Updates /tmp/ars_expert_land.npz; prints eval with episode length
(survival) alongside apex.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--iters", type=int, default=120)
ap.add_argument("--no-filter", action="store_true")
ap.add_argument("--inp", default="/tmp/ars_expert.npz")
ap.add_argument("--out", default="/tmp/ars_expert_land.npz")
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.train import normalize as vnorm
from quadruped_springs_tpu.train import rollout as ro
from quadruped_springs_tpu.train.ars import ARSConfig, ARSTrainer
from quadruped_springs_tpu.train.networks import linear_policy_apply

z = np.load(args.inp)

env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=1.9,
    enable_action_filter=not args.no_filter))
ars = ARSTrainer(env, ARSConfig(
    n_directions=8, top_directions=4, episode_steps=200,
    reset_bank_size=8, step_size=0.02, delta_std=0.03))
ts = ars.init(jax.random.PRNGKey(10))
ts = ts.replace(W=jnp.asarray(z["W"]),
                obs_norm=vnorm.RunningNorm(
                    jnp.asarray(z["mean"]), jnp.asarray(z["var"]),
                    jnp.asarray(z["count"])))

states, obs0 = ro.make_reset_bank(env, jax.random.PRNGKey(55), 16)


@jax.jit
def wide_eval(W, on):
    def policy(obs):
        return jax.vmap(linear_policy_apply, in_axes=(None, 0))(
            W, vnorm.normalize(on, obs))
    rets, info = ro.episode_returns(env, policy, states, obs0, 200)
    return (jnp.mean(rets), jnp.mean(info["length"]),
            jnp.mean(info["max_height"]), jnp.max(info["max_height"]))


def report(tag, W, on):
    r, l, am, ax = (float(x) for x in wide_eval(W, on))
    print(f"{tag} ret {r:+.3f} len {l:5.1f} apex mean {am:.3f} max {ax:.3f}",
          flush=True)
    return r, am


r0, _ = report("[start    ]", ts.W, ts.obs_norm)
best = (r0, ts.W, ts.obs_norm)
for i in range(args.iters):
    ts, m = ars.train_step(ts)
    if i % 10 == 9:
        r, am = report(f"[cont {i:03d}]", ts.W, ts.obs_norm)
        if r > best[0]:
            best = (r, ts.W, ts.obs_norm)

r, W, on = best
np.savez(args.out, W=np.asarray(W), mean=np.asarray(on.mean),
         var=np.asarray(on.var), count=np.asarray(on.count), ret=r)
print(f"saved best continued expert (ret {r:+.3f})")
