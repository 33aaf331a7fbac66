"""Robust backflip: JOINT launch+lander training on the flattened episode.

Why joint, and why this harness (round-4 findings, scripts/diag_*):
  * Attempts 1-5 trained only the post-touchdown LANDER and plateaued at
    6/12 held-out strict upright. Measured root cause
    (scripts/diag_backflip_robust.py + a hold-action probe): on every
    failing scenario the tilted touchdown drives a knee/calf bumper into
    the ground INSIDE the first 10 ms knot after handoff — an
    invalid-contact termination no post-touchdown policy (ARS, BPTT, or
    even catch-aware receding-horizon MPPI on the RECOVERY cost) can
    prevent: the strike is kinematically committed at handoff. The fix
    must come from the FLIGHT — i.e. the LAUNCH policy must deliver
    touchdown attitudes the lander can survive. That is also the
    reference-faithful lever: the policy owns the launch, the autopilot
    owns descent (landing_wrapper_backflip2.py).
  * Round 3's robust-launch training was Python-loop-bound (the
    autopilot's nested while_loops are un-vmappable), limiting it to a
    few serial episodes per evaluation. env/flat_rollout.py re-expresses
    the autopilot phase machine as a branch-free scan (parity-gated in
    tests/test_wrapper_parity.py), so WHOLE EPISODES vmap across
    randomized scenarios: one ARS iteration evaluates 32 candidate
    parameter vectors x 16 scenarios = 512 full episodes lane-parallel.

Objective per episode (the deployed gate, smoothed): rotation progress +
rotation bar sigmoid + final up_z + strict-upright sigmoid + stand-height
sigmoid + alive fraction. Strict indicator reported alongside.

Validation/save bars (VERDICT r3 next #2) are measured on the REAL
wrapper deployment loop (not the flattened surrogate): nominal 4/4,
held-out (seeds 77000+) rotation 12/12 and strict upright >= 10/12.
Artifacts: examples/policies/backflip_launch_robust.npz (linear launch)
and examples/policies/backflip_landing_mlp.npz (MLP lander).

Usage: python scripts/train_backflip_robust_joint.py [--cpu] [--iters 150]
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
ap.add_argument("--iters", type=int, default=150)
ap.add_argument("--n-train", type=int, default=64,
                help="fixed randomized training scenarios (reset states)")
ap.add_argument("--n-probe", type=int, default=24,
                help="held-out flattened probe scenarios for selection")
ap.add_argument("--train-scen", type=int, default=16,
                help="scenarios per ARS direction evaluation")
ap.add_argument("--n-dir", type=int, default=16)
ap.add_argument("--step-size", type=float, default=0.015)
ap.add_argument("--delta-std", type=float, default=0.02)
ap.add_argument("--knots", type=int, default=160,
                help="flattened episode length in sim knots; must cover the "
                     "deployed loop's 120 POLICY steps PLUS the ~25-40 "
                     "autopilot knots consumed inside the switch step — a "
                     "short horizon measures 'strict upright' mid-flight")
ap.add_argument("--probe-every", type=int, default=10)
ap.add_argument("--launch-out",
                default="examples/policies/backflip_launch_robust.npz")
ap.add_argument("--lander-out",
                default="examples/policies/backflip_landing_mlp.npz")
ap.add_argument("--no-save-gate", action="store_true")
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.env import flat_rollout as fr
from quadruped_springs_tpu.env import wrappers as wr
from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.models import spatial as sp
from quadruped_springs_tpu.train import normalize as vnorm
from quadruped_springs_tpu.train.networks import linear_policy_apply

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TWO_PI_BAR = 2 * np.pi - 0.1

env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="BACKFLIP",
    observation_space_mode="ARS_BACKFLIP", action_space_mode="SYMMETRIC",
    obs_noise=True, max_ep_len=4.0, env_randomizer_mode="TEST_RANDOMIZER"))
nom_env = QuadrupedEnv(EnvConfig(
    enable_springs=True, task_env="BACKFLIP",
    observation_space_mode="ARS_BACKFLIP", action_space_mode="SYMMETRIC",
    obs_noise=False, max_ep_len=4.0))

d = np.load(os.path.join(HERE, "examples/policies/backflip_ars.npz"))
on = vnorm.RunningNorm(mean=jnp.asarray(d["mean"]),
                       var=jnp.asarray(d["var"]),
                       count=jnp.asarray(d["count"]))
params0 = {"W": jnp.asarray(d["W"])}
cand_path = os.path.join(HERE,
                         "examples/policies/backflip_landing_mlp.npz.cand.npz")
m = np.load(cand_path)
params0["mlp"] = {k: jnp.asarray(m[k]) for k in ("W1", "b1", "W2", "b2")}
flat0, unravel = jax.flatten_util.ravel_pytree(params0)
print(f"joint params: launch {params0['W'].size} + lander "
      f"{flat0.size - params0['W'].size} = {flat0.size}", flush=True)


def make_score(e):
    """Flattened-episode objective on env `e` (closure — envs are static
    Python objects, not vmappable pytrees)."""

    def episode_score(flat_params, state0, obs0):
        p = unravel(flat_params)

        def launch_fn(o):
            return linear_policy_apply(p["W"], vnorm.normalize(on, o))

        def lander_fn(o):
            mlp = p["mlp"]
            h = jnp.tanh(mlp["W1"] @ vnorm.normalize(on, o) + mlp["b1"])
            return jnp.clip(mlp["W2"] @ h + mlp["b2"], -1.0, 1.0)

        state_f, ph_f, traj = fr.backflip_episode(e, launch_fn, lander_fn,
                                                  state0, obs0, args.knots)
        pitch_f = state_f.task.max_pitch_bf
        up_f = sp.quat_to_mat(state_f.robot.quat)[2, 2]
        z_f = state_f.robot.pos[2]
        alive_frac = 1.0 - jnp.mean(traj["done"].astype(jnp.float32))
        score = (2.0 * jax.nn.sigmoid(60.0 * (pitch_f - TWO_PI_BAR))
                 + 0.5 * jnp.clip(pitch_f / (2 * jnp.pi), 0.0, 1.0)
                 + 1.0 * jnp.clip(up_f, 0.0, 1.0)
                 + 1.0 * jax.nn.sigmoid(30.0 * (up_f - 0.85))
                 + 0.5 * jax.nn.sigmoid(50.0 * (z_f - 0.15))
                 + 0.3 * alive_frac)
        strict = (pitch_f >= TWO_PI_BAR) & (up_f > 0.85) & (z_f > 0.15)
        return score, strict

    return episode_score


score_rand = make_score(env)
score_nom = make_score(nom_env)


# scenarios (training fixed, probe held out) — vmapped resets
print("resetting scenario banks...", flush=True)
t0 = time.time()
keys_train = jax.vmap(jax.random.PRNGKey)(jnp.arange(args.n_train))
states_train, obs_train = jax.vmap(env.reset)(keys_train)
keys_probe = jax.vmap(jax.random.PRNGKey)(20000 + jnp.arange(args.n_probe))
states_probe, obs_probe = jax.vmap(env.reset)(keys_probe)
keys_nom = jax.vmap(jax.random.PRNGKey)(1000 + jnp.arange(4))
states_nom, obs_nom = jax.vmap(nom_env.reset)(keys_nom)
print(f"resets done ({time.time() - t0:.0f}s)", flush=True)


@jax.jit
def ars_returns(flat_batch, idx):
    sub_s = jax.tree.map(lambda a: a[idx], states_train)
    sub_o = obs_train[idx]

    def one(fp):
        sc, _ = jax.vmap(score_rand, in_axes=(None, 0, 0))(fp, sub_s, sub_o)
        return jnp.mean(sc)

    return jax.vmap(one)(flat_batch)


@jax.jit
def eval_probe(fp):
    sc, strict = jax.vmap(score_rand, in_axes=(None, 0, 0))(
        fp, states_probe, obs_probe)
    return jnp.mean(sc), jnp.sum(strict.astype(jnp.int32))


@jax.jit
def eval_train(fp):
    sc, strict = jax.vmap(score_rand, in_axes=(None, 0, 0))(
        fp, states_train, obs_train)
    return jnp.mean(sc), jnp.sum(strict.astype(jnp.int32))


@jax.jit
def eval_nom(fp):
    sc, strict = jax.vmap(score_nom, in_axes=(None, 0, 0))(
        fp, states_nom, obs_nom)
    return jnp.mean(sc), jnp.sum(strict.astype(jnp.int32))


def save_params(p):
    os.makedirs(os.path.dirname(os.path.join(HERE, args.launch_out)),
                exist_ok=True)
    np.savez(os.path.join(HERE, args.launch_out) + ".cand.npz",
             W=np.asarray(p["W"]), mean=np.asarray(on.mean),
             var=np.asarray(on.var), count=np.asarray(on.count))
    np.savez(os.path.join(HERE, args.lander_out) + ".cand.npz",
             **{k: np.asarray(v) for k, v in p["mlp"].items()},
             mean=np.asarray(on.mean), var=np.asarray(on.var),
             count=np.asarray(on.count))


rng = np.random.default_rng(0)
flat = np.asarray(flat0)
t0 = time.time()
tr0, ts0 = eval_train(jnp.asarray(flat))
pv0, ps0 = eval_probe(jnp.asarray(flat))
nv0, ns0 = eval_nom(jnp.asarray(flat))
best = ((int(ns0), int(ps0), float(pv0)), flat.copy())
print(f"[init] train {float(tr0):.3f} strict {int(ts0)}/{args.n_train} | "
      f"probe {float(pv0):.3f} strict {int(ps0)}/{args.n_probe} | "
      f"nom strict {int(ns0)}/4 ({time.time()-t0:.0f}s incl compile)",
      flush=True)

t_start = time.time()
for i in range(args.iters):
    idx = jnp.asarray(rng.choice(args.n_train, args.train_scen,
                                 replace=False))
    deltas = rng.normal(size=(args.n_dir, flat.size)).astype(np.float32)
    cand = np.concatenate([flat[None] + args.delta_std * deltas,
                           flat[None] - args.delta_std * deltas])
    rets = np.asarray(ars_returns(jnp.asarray(cand), idx))
    rp, rm = rets[:args.n_dir], rets[args.n_dir:]
    order = np.argsort(-np.maximum(rp, rm))[:args.n_dir // 2]
    sigma = np.std(np.concatenate([rp[order], rm[order]])) + 1e-8
    flat = flat + args.step_size / (len(order) * sigma) * (
        (rp[order] - rm[order]) @ deltas[order])
    if (i + 1) % args.probe_every == 0:
        fj = jnp.asarray(flat)
        tr, ts_ = eval_train(fj)
        pv, ps = eval_probe(fj)
        nv, ns = eval_nom(fj)
        key = (int(ns), int(ps), float(pv))
        if key > best[0]:
            best = (key, flat.copy())
            save_params(unravel(jnp.asarray(flat)))
        print(f"[ars {i:03d}] train {float(tr):.3f} strict "
              f"{int(ts_)}/{args.n_train} | probe strict "
              f"{int(ps)}/{args.n_probe} | nom {int(ns)}/4 "
              f"(best {best[0]}) {time.time()-t_start:.0f}s", flush=True)

params_best = unravel(jnp.asarray(best[1]))
save_params(params_best)


# ---- held-out validation on the REAL wrapper deployment loop -----------

def full_episode(p, env_e, seed, max_steps=120):
    w_e = wr.LandingWrapperBackflip(env_e, variant="until_grounded")
    state, obs = env_e.reset(jax.random.PRNGKey(seed))
    wstate = w_e.init_state()
    for _ in range(max_steps):
        o = vnorm.normalize(on, obs)
        if bool(wstate.armed):
            a = linear_policy_apply(p["W"], o)
        else:
            mlp = p["mlp"]
            h = jnp.tanh(mlp["W1"] @ o + mlp["b1"])
            a = jnp.clip(mlp["W2"] @ h + mlp["b2"], -1.0, 1.0)
        out, wstate = w_e.step(state, a, wstate)
        state, obs = out.state, out.obs
        if bool(out.done):
            break
    R = np.asarray(sp.quat_to_mat(state.robot.quat))
    return {
        "rot": float(state.task.max_pitch_bf) >= TWO_PI_BAR,
        "upright": bool(R[2, 2] > 0.85 and float(state.robot.pos[2]) > 0.15),
        "pitch_deg": float(np.degrees(float(state.task.max_pitch_bf))),
        "up_z": float(R[2, 2]), "z": float(state.robot.pos[2]),
    }


print("validating on the real wrapper...", flush=True)
nom = [full_episode(params_best, nom_env, 1000 + s) for s in range(4)]
nom_ok = sum(r["rot"] and r["upright"] for r in nom)
val = [full_episode(params_best, env, 77000 + s) for s in range(12)]
rot_ok = sum(r["rot"] for r in val)
up_ok = sum(r["rot"] and r["upright"] for r in val)
for r in val:
    print(f"  pitch {r['pitch_deg']:.0f} up_z {r['up_z']:+.2f} z {r['z']:.2f}",
          flush=True)
print(f"[validation] nominal {nom_ok}/4, fresh rotation {rot_ok}/12, "
      f"fresh strict upright {up_ok}/12", flush=True)

gate_ok = nom_ok == 4 and rot_ok == 12 and up_ok >= 10
if gate_ok or args.no_save_gate:
    np.savez(os.path.join(HERE, args.launch_out),
             W=np.asarray(params_best["W"]), mean=np.asarray(on.mean),
             var=np.asarray(on.var), count=np.asarray(on.count),
             nominal_ok=nom_ok, rot_ok=rot_ok, upright_ok=up_ok,
             gate_ok=gate_ok)
    np.savez(os.path.join(HERE, args.lander_out),
             **{k: np.asarray(v) for k, v in params_best["mlp"].items()},
             mean=np.asarray(on.mean), var=np.asarray(on.var),
             count=np.asarray(on.count),
             nominal_ok=nom_ok, rot_ok=rot_ok, upright_ok=up_ok,
             gate_ok=gate_ok)
    print(f"saved {args.launch_out} + {args.lander_out} (gate_ok={gate_ok})")
else:
    print("[validation] FAILED save bars (nominal 4/4 + rotation 12/12 + "
          "upright >= 10/12) — not saving")
print(json.dumps({"nominal": nom_ok, "rotation": rot_ok, "upright": up_ok,
                  "probe_best": best[0]}))
sys.exit(0 if gate_ok else 1)
