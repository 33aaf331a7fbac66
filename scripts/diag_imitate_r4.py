"""Round-4 diagnosis: why does the PPO-imitation polish DESTROY the BC
initializer at real demo scale (185 rows) when the 40-step hermetic test
learns fine (VERDICT r3 missing #1)?

Two candidate mechanisms, each tested in isolation on the COMMITTED
round-3 demos (examples/out/demo_jip_*.qsts):

  (1) No critic warmup: the imitation stage starts PPO with a random
      critic (bc.fit leaves the value tower at init), so the first
      iterations' GAE advantages are garbage and every train_step walks
      the actor up to its kl_stop budget in a noise direction. The
      fine-tune stage already has this rail; the imitation stage didn't.
  (2) Reward-scale aliasing from the reference's remaining-steps
      normalization (task_base.py:183-211: r/(demo_len-demo_start))
      under uniform RSI: at 185 rows the SAME physical state earns
      rewards differing by up to ~60x depending on the episode's start
      row (vs 5x at 40 rows — the scale the hermetic test never sees).
      The obs carries no demo index, so the critic cannot represent the
      spread; advantages acquire a per-episode bias that reinforces
      late-start (landing/rest) episodes and erodes the launch.

Arms (60 polish iters each, probe on the dense task every 10):
  A  round-3 shipped config (control — expect decay)
  B  A + 30-iter critic warmup (freeze_actor)
  C  B + demo_norm="full" (state-consistent reward normalization)
  D  C + polish lr 1e-4

Usage: python scripts/diag_imitate_r4.py [--cpu] [--iters 60]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--iters", type=int, default=60)
ap.add_argument("--warmup", type=int, default=30)
ap.add_argument("--arms", default="ABCD")
ap.add_argument("--out", default="/tmp/diag_imitate_r4.json")
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.env import demo_pipeline as dp
from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.train import bc
from quadruped_springs_tpu.train import normalize as vnorm
from quadruped_springs_tpu.train import rollout as ro
from quadruped_springs_tpu.train.ppo import PPOConfig, PPOTrainer

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
demos = []
for k in range(6):
    p = os.path.join(HERE, "examples/out", f"demo_jip_{k}.qsts")
    if os.path.exists(p):
        demos.append(dp.load_demo_library(p))
print(f"loaded {len(demos)} committed demos, rows {[d.shape[0] for d in demos]}")
demo0 = demos[0]

from quadruped_springs_tpu.utils import demo as demo_util

ACT_DIM = 6
acts0 = demo_util.demo_actions(demo0, ACT_DIM)

ft_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="JUMPING_IN_PLACE_PPO",
    observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
    settling_steps=600, max_ep_len=2.0))


def make_demo_env(norm):
    return QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="JUMPING_IN_PLACE_DEMO",
        observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
        settling_steps=600, max_ep_len=2.5, demo_norm=norm),
        demo_actions=acts0)


probe_states, probe_obs0 = ro.make_reset_bank(ft_env, jax.random.PRNGKey(5), 16)


def run_arm(name, demo_norm, warmup, lr, rho=0.9, log_std=-2.0,
            from_scratch=False, iters=None, probe_every=10,
            anchor=0.0, bc_coef=0.0):
    demo_env = make_demo_env(demo_norm)
    cfg = PPOConfig(n_envs=32, segment_len=64, reset_bank_size=16,
                    gamma=0.3, gae_lambda=0.9, lr=lr, kl_stop=0.03,
                    freeze_obs_norm=True, noise_rho=rho,
                    anchor_coef=anchor, bc_coef=bc_coef)
    tr = PPOTrainer(demo_env, cfg, demo=demo0)
    tr_warm = PPOTrainer(demo_env,
                         dataclasses.replace(cfg, lr=3e-4, freeze_actor=True),
                         demo=demo0)

    obs_list, act_list = [], []
    for i, d in enumerate(demos):
        o, a = bc.demo_dataset(demo_env, d, jax.random.PRNGKey(21 + i))
        obs_list.append(o)
        act_list.append(a)
    bc_params, bc_norm, bc_mse = bc.fit(
        tr.net, jnp.concatenate(obs_list), jnp.concatenate(act_list),
        jax.random.PRNGKey(22), log_std=log_std)

    @jax.jit
    def probe(params, obs_norm):
        def policy(obs):
            mean, _, _ = tr.net.apply(params, vnorm.normalize(obs_norm, obs))
            return jnp.clip(mean, -1.0, 1.0)
        rets, info = ro.episode_returns(
            ft_env, policy, probe_states, probe_obs0, 200)
        return (jnp.mean(rets), jnp.mean(info["max_height"]),
                jnp.max(info["max_height"]))

    # deterministic closed-loop return on the DEMO env (the stage's own
    # objective, free of the exploration-noise floor): from clean resets,
    # perfect tracking would return ~1.0
    dm_states, dm_obs0 = ro.make_reset_bank(demo_env, jax.random.PRNGKey(77), 8)

    @jax.jit
    def demo_eval(params, obs_norm):
        def policy(obs):
            mean, _, _ = tr.net.apply(params, vnorm.normalize(obs_norm, obs))
            return jnp.clip(mean, -1.0, 1.0)
        rets, _ = ro.episode_returns(demo_env, policy, dm_states, dm_obs0, 200)
        return jnp.mean(rets)

    ts = tr.init(jax.random.PRNGKey(1))
    if from_scratch:
        # reference-true imitation: PPO learns the demo from a RANDOM
        # init (load_model.py:45-47 — the reference has no BC stage);
        # BC above still runs to provide the comparison yardstick.
        p = dict(ts.params["params"])
        p["log_std"] = jnp.full_like(p["log_std"], log_std)
        ts = ts.replace(params={"params": p}, obs_norm=bc_norm)
    else:
        ts = ts.replace(params=bc_params, obs_norm=bc_norm,
                        opt_state=tr.tx.init(bc_params))
        if anchor > 0.0:
            tr.set_anchor(bc_params)
            tr_warm.set_anchor(bc_params)
        if bc_coef > 0.0:
            bo = vnorm.normalize(bc_norm, jnp.concatenate(obs_list))
            tr.set_bc_anchor(bo, jnp.concatenate(act_list))
            tr_warm.set_bc_anchor(bo, jnp.concatenate(act_list))
    r0, am0, ax0 = (float(x) for x in probe(bc_params, bc_norm))
    rec = {"arm": name, "demo_norm": demo_norm, "warmup": warmup, "lr": lr,
           "rho": rho, "log_std": log_std, "from_scratch": from_scratch,
           "bc_mse": float(bc_mse), "bc_apex_mean": am0, "bc_apex_max": ax0,
           "bc_demo_return": float(demo_eval(bc_params, bc_norm)),
           "curve": []}
    print(f"[{name}] BC probe: ret {r0:+.3f} apex mean {am0:.3f} max {ax0:.3f}")

    t0 = time.time()
    n_iters = args.iters if iters is None else iters
    for i in range(warmup):
        ts, m = tr_warm.train_step(ts)
        if i % 10 == 9:
            print(f"[{name} warm {i:03d}] vf {float(m['vf_loss']):.3e}",
                  flush=True)
    for i in range(n_iters):
        ts, m = tr.train_step(ts)
        if i % probe_every == probe_every - 1:
            r, am, ax = (float(x) for x in probe(ts.params, ts.obs_norm))
            de = float(demo_eval(ts.params, ts.obs_norm))
            rec["curve"].append(
                {"iter": i, "mean_reward": float(m["mean_reward"]),
                 "kl": float(m["kl_est"]), "demo_return": de,
                 "apex_mean": am, "apex_max": ax})
            print(f"[{name} {i:03d}] r_im {float(m['mean_reward']):+.5f} "
                  f"kl {float(m['kl_est']):.4f} "
                  f"bc_mse {float(m.get('bc_mse', 0.0)):.2e} "
                  f"demo_ret {de:+.3f} "
                  f"apex mean {am:.3f} max {ax:.3f}", flush=True)
    rec["wall_s"] = round(time.time() - t0, 1)
    rec["final_apex_mean"] = rec["curve"][-1]["apex_mean"]
    rec["final_apex_max"] = rec["curve"][-1]["apex_max"]
    return rec


ARMS = {
    "A": dict(demo_norm="remaining", warmup=0, lr=3e-4),
    "B": dict(demo_norm="remaining", warmup=args.warmup, lr=3e-4),
    "C": dict(demo_norm="full", warmup=args.warmup, lr=3e-4),
    "D": dict(demo_norm="full", warmup=args.warmup, lr=1e-4),
    # second round: isolate the exploration-noise settings that differ
    # from the (passing) hermetic test — rho=0.9 AR(1) + log_std=-2.0
    "E": dict(demo_norm="full", warmup=args.warmup, lr=3e-4,
              rho=0.0, log_std=-1.0),
    "F": dict(demo_norm="full", warmup=args.warmup, lr=3e-4,
              rho=0.9, log_std=-1.0),
    "G": dict(demo_norm="full", warmup=args.warmup, lr=3e-4,
              rho=0.0, log_std=-2.0),
    "H": dict(demo_norm="remaining", warmup=0, lr=1e-3,
              rho=0.0, log_std=-1.0),
    # reference-true mechanism at real scale: PPO imitation from SCRATCH
    "S": dict(demo_norm="full", warmup=0, lr=1e-3, rho=0.0,
              log_std=-1.0, from_scratch=True, iters=400, probe_every=20),
    # anchored polish (PPOConfig.anchor_coef): trust region to the BC
    # initializer — suppresses the Adam noise-wander every unanchored
    # arm showed while leaving room for reward-justified improvement
    "P": dict(demo_norm="full", warmup=args.warmup, lr=3e-4,
              rho=0.0, log_std=-2.0, anchor=1.0),
    "Q": dict(demo_norm="full", warmup=args.warmup, lr=3e-4,
              rho=0.0, log_std=-2.0, anchor=0.3),
    "R": dict(demo_norm="full", warmup=args.warmup, lr=3e-4,
              rho=0.0, log_std=-2.0, anchor=3.0),
    # demo-set BC anchor (PPOConfig.bc_coef): pins every demo row
    # (launch included) with uniform weight — the dilution-proof anchor
    "T": dict(demo_norm="full", warmup=args.warmup, lr=3e-4,
              rho=0.0, log_std=-2.0, bc_coef=1.0),
    "U": dict(demo_norm="full", warmup=args.warmup, lr=3e-4,
              rho=0.0, log_std=-2.0, bc_coef=0.3),
    # pg gradients in mean-action space scale ~1/sigma^2 (≈55 at
    # log_std=-2) while the quadratic anchor restores with 2*beta*Δa:
    # balance needs beta in the hundreds
    "V": dict(demo_norm="full", warmup=args.warmup, lr=3e-4,
              rho=0.0, log_std=-2.0, bc_coef=30.0),
    "W": dict(demo_norm="full", warmup=args.warmup, lr=3e-4,
              rho=0.0, log_std=-2.0, bc_coef=300.0),
    # long-horizon confirmations of the winning configuration
    "Y": dict(demo_norm="full", warmup=args.warmup, lr=3e-4,
              rho=0.0, log_std=-2.0, bc_coef=300.0, iters=300,
              probe_every=20),
    "Z": dict(demo_norm="full", warmup=args.warmup, lr=3e-4,
              rho=0.0, log_std=-1.5, bc_coef=300.0, iters=300,
              probe_every=20),
}
out = []
for a in args.arms:
    out.append(run_arm(a, **ARMS[a]))
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
print(json.dumps([{k: r[k] for k in (
    "arm", "bc_apex_mean", "final_apex_mean", "final_apex_max", "wall_s")}
    for r in out], indent=2))
print(f"wrote {args.out}")
