"""Train + commit the small linear ARS policies that drive the
closed-loop behavior demos (the reference's architecture: an RL launch
policy + the landing autopilot wrappers, landing_wrapper_backflip.py:8-81;
the reference ships such policies as rl-zoo best_model.zip artifacts that
load_model.py reloads — here they are committed .npz weight files that
the tests and examples reload).

The backflip recipe mirrors the reference's own two-stage methodology
(learn -> imitate -> fine-tune, load_model.py:45-47), compressed:

  1. demo collection: the known-good crouch+extend launch schedule (the
     round-2 hand script, examples/run_backflip_closed_loop.py
     --launch script) is rolled out with observation noise to produce
     (obs, action) pairs — the policy only ever acts BEFORE the take-off
     switch (the autopilot owns everything after,
     landing_wrapper_backflip.py:47-52), so the dataset is the launch.
  2. behavior cloning: ridge-fit the linear policy W on the normalized
     pairs. Measured: BC alone completes the rotation (359 deg) but
     lands on its back (up_z -0.90) — the cloned launch over-rotates.
  3. ARS fine-tune ON THE TRUE SPARSE TASK REWARD (BackFlip,
     robot_tasks.py:518-550: 0.4*pitch/2pi + 0.4*h + h*pitch + 0.2 if
     upright) through the LandingWrapperBackflip autopilot, with the
     observation statistics FROZEN (ARSConfig.freeze_obs_norm — the
     warm-start-collapse lesson from the PPO pipeline). The +0.2 upright
     landing term is exactly what BC lacks. Training from scratch on
     this reward was measured to fall into the pitch-unwrap loophole
     (a tiny forward tilt reads as 2pi - eps, eval pinned at +2.000 with
     zero rotation); warm-started from a real flip, the true reward
     prefers the real flip (it pays ~1.8 vs the loophole's ~0.65).

Usage:
  python scripts/train_behavior_policies.py --cpu --task backflip
  python scripts/train_behavior_policies.py --cpu --task forward
Writes examples/policies/<task>_ars.npz (W, obs stats, training metrics).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax

ap = argparse.ArgumentParser()
ap.add_argument("--cpu", action="store_true")
ap.add_argument("--task", choices=("backflip", "forward"), required=True)
ap.add_argument("--iters", type=int, default=60)
ap.add_argument("--robust", action="store_true",
                help="backflip: continue the fine-tune under full domain "
                     "randomization (TEST_RANDOMIZER masses/springs/ground "
                     "+ obs noise), warm-started from the committed policy. "
                     "Measured before: rotation is already 12/12 robust but "
                     "the landing tilt misses the 0.85 upright bar on 11/12 "
                     "randomized scenarios.")
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.env import wrappers as wr
from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.models import spatial as sp
from quadruped_springs_tpu.train import normalize as vnorm
from quadruped_springs_tpu.train.ars import ARSConfig, ARSTrainer
from quadruped_springs_tpu.train.networks import linear_policy_apply


def collect_script_demo(env, action_at, n_seeds=8, max_steps=40):
    """Roll the scripted launch until the take-off switch (+2 steps),
    collecting (obs, action) pairs — the policy's whole deployment-time
    responsibility."""
    O, A = [], []
    for seed in range(n_seeds):
        state, obs = env.reset(jax.random.PRNGKey(seed))
        extra = 0
        for i in range(max_steps):
            a = action_at(i)
            O.append(np.asarray(obs))
            A.append(np.asarray(a))
            state, obs, r, done, info = env.step(state, a)
            if bool(state.task.switched_controller):
                extra += 1
                if extra >= 2:
                    break
    return np.stack(O), np.stack(A)


def ridge_fit(O, A, lam=1e-3):
    mean = O.mean(0)
    var = O.var(0) + 1e-8
    X = (O - mean) / np.sqrt(var)
    W = np.linalg.solve(X.T @ X + lam * np.eye(X.shape[1]), X.T @ A).T
    return W, mean, var


def _episode(env, w, W, on, seed, max_steps=80):
    """One closed-loop episode through the autopilot (either variant).
    Returns (final_state, summed_reward). For variant='until_grounded'
    the one-shot arming state is carried, and control RETURNS to the
    policy after touchdown (landing_wrapper_backflip2.py:72-83) — the
    policy is responsible for post-landing stabilization."""
    v2 = w.variant == "until_grounded"
    wstate = w.init_state() if v2 else None
    state, obs = env.reset(jax.random.PRNGKey(seed))
    total = 0.0
    for _ in range(max_steps):
        a = linear_policy_apply(W, vnorm.normalize(on, obs))
        if v2:
            out, wstate = w.step(state, a, wstate)
        else:
            out = w.step(state, a)
        state, obs = out.state, out.obs
        total += float(out.reward)
        if bool(out.done):
            break
    return state, total


def eval_backflip(env, w, W, on, n_seeds=4, max_steps=80):
    """Closed-loop through the autopilot; the committed gate's criteria."""
    rows = []
    for seed in range(n_seeds):
        state, total = _episode(env, w, W, on, 1000 + seed, max_steps)
        R = np.asarray(sp.quat_to_mat(state.robot.quat))
        rows.append({
            "pitch_rad": float(state.task.max_pitch_bf),
            "apex": float(state.task.relative_max_height),
            "up_z": float(R[2, 2]),
            "z": float(state.robot.pos[2]),
            "reward": total,
        })
    return rows


if args.task == "backflip":
    # training env: obs noise ON for demo diversity + robustness; --robust
    # adds the full randomizer stack (the reference's training condition)
    train_cfg = EnvConfig(
        enable_springs=True, task_env="BACKFLIP",
        observation_space_mode="ARS_BACKFLIP",
        action_space_mode="SYMMETRIC", obs_noise=True, max_ep_len=2.5,
        env_randomizer_mode="TEST_RANDOMIZER" if args.robust else "GROUND_RANDOMIZER")
    env_t = QuadrupedEnv(train_cfg)

    # -- stage 1: demo = the proven launch schedule (6-knot crouch ramp) --
    crouch = jnp.array([0.0, 0.5, -0.9, 0.0, 0.5, -0.9])
    launch_a = jnp.array([0.0, -0.3, 0.7, 0.0, -1.0, 1.0])

    def action_at(i):
        frac = min((i + 1) / 6, 1.0)
        return frac * crouch if i < 6 else launch_a

    if args.robust:
        # continue from the committed robust policy if present (else the
        # nominal one); robustness training only has to harden the landing
        # tilt, not re-find the flip
        robust_path = "examples/policies/backflip_ars_robust.npz"
        d = np.load(robust_path if os.path.exists(robust_path)
                    else "examples/policies/backflip_ars.npz")
        Wj = jnp.asarray(d["W"])
        on = vnorm.RunningNorm(mean=jnp.asarray(d["mean"]),
                               var=jnp.asarray(d["var"]),
                               count=jnp.asarray(d["count"]))
    else:
        O, A = collect_script_demo(env_t, action_at)
        print(f"demo dataset: {O.shape[0]} pairs", flush=True)

        # -- stage 2: behavior cloning -------------------------------------
        W, mean, var = ridge_fit(O, A)
        on = vnorm.RunningNorm(mean=jnp.asarray(mean), var=jnp.asarray(var),
                               count=jnp.asarray(float(len(O))))
        Wj = jnp.asarray(W)

    # eval env: the committed gate's condition, plus the randomizer stack
    # in robust mode (success must hold across randomized scenarios then)
    eval_env = QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="BACKFLIP",
        observation_space_mode="ARS_BACKFLIP",
        action_space_mode="SYMMETRIC", obs_noise=args.robust,
        env_randomizer_mode="TEST_RANDOMIZER" if args.robust else "GROUND_RANDOMIZER",
        max_ep_len=2.5))
    # robust mode trains/evals through the v2 wrapper: control returns to
    # the policy after touchdown, so landing stabilization is LEARNABLE
    # (with variant="hold" the autopilot owns everything post-switch and
    # ARS has no gradient onto the landing — measured plateau at 3/6)
    variant = "until_grounded" if args.robust else "hold"
    eval_w = wr.LandingWrapperBackflip(eval_env, variant=variant)
    n_eval = 8 if args.robust else 4
    for r in eval_backflip(eval_env, eval_w, Wj, on, n_seeds=n_eval):
        print(f"[init] pitch {np.degrees(r['pitch_rad']):.0f} deg "
              f"apex {r['apex']:.3f} up_z {r['up_z']:+.3f} "
              f"reward {r['reward']:+.3f}", flush=True)

    # -- stage 3: ARS fine-tune on the true sparse reward, autopilot in the
    # loop, obs stats frozen. The autopilot's nested while_loops under a
    # vmapped scan make ARSTrainer.train_step an XLA compile bomb
    # (measured: >21 min and counting on this 1-CPU box), so the ARS
    # update itself runs at Python level against the SAME jit-cached
    # single-episode closed-loop eval used by the deployment example —
    # algorithmically identical (ARS-v2 top-b update, frozen obs stats),
    # just not batch-compiled.
    train_w = wr.LandingWrapperBackflip(env_t, variant=variant)

    def episode_reward(W, seed):
        """True sparse BACKFLIP return through the autopilot, obs noise on."""
        _, total = _episode(env_t, train_w, jnp.asarray(W), on, seed,
                            max_steps=40 if not args.robust else 120)
        return total

    def ret_W(W, seeds):
        return float(np.mean([episode_reward(W, s) for s in seeds]))

    n_dir, top_b, step_size, delta_std = 6, 3, 0.01, 0.015
    rng = np.random.default_rng(0)
    W_cur = np.asarray(Wj)

    def score(rows):
        # selection metric = the committed gate, counted per scenario:
        # (n scenarios passing full-rotation AND upright, mean true reward)
        n_ok = sum(r["pitch_rad"] >= 2 * np.pi - 0.1 and r["up_z"] > 0.85
                   and r["z"] > 0.15 for r in rows)
        return n_ok, float(np.mean([r["reward"] for r in rows]))

    def eval_rows(W, base_seed=1000):
        # selection on a FIXED seed set: fresh-seed selection was measured
        # to pick noisier checkpoints (nominal 1/4 vs 4/4); the honest
        # generalization number comes from the held-out validation below
        rows = []
        for s in range(n_eval):
            st, total = _episode(eval_env, eval_w, W, on, base_seed + s,
                                 max_steps=120)
            R = np.asarray(sp.quat_to_mat(st.robot.quat))
            rows.append({"pitch_rad": float(st.task.max_pitch_bf),
                         "apex": float(st.task.relative_max_height),
                         "up_z": float(R[2, 2]),
                         "z": float(st.robot.pos[2]), "reward": total})
        return rows

    rows = eval_rows(jnp.asarray(W_cur))
    best = (score(rows), W_cur.copy(), on)
    print(f"[finetune init] gate={best[0][0]}/{n_eval} "
          f"reward {best[0][1]:+.3f}", flush=True)
    for i in range(args.iters):
        seeds = [int(rng.integers(1 << 30)) for _ in range(2)]
        deltas = rng.normal(size=(n_dir,) + W_cur.shape) * delta_std
        rp = np.array([ret_W(W_cur + d, seeds) for d in deltas])
        rm = np.array([ret_W(W_cur - d, seeds) for d in deltas])
        order = np.argsort(-np.maximum(rp, rm))[:top_b]
        sigma = np.std(np.concatenate([rp[order], rm[order]])) + 1e-8
        upd = np.einsum("d,dij->ij", rp[order] - rm[order], deltas[order])
        W_cur = W_cur + step_size / delta_std * upd / (top_b * sigma)

        rows = eval_rows(jnp.asarray(W_cur))
        sc = score(rows)
        if sc > best[0]:
            best = (sc, W_cur.copy(), on)
        r0 = rows[0]
        print(f"[backflip-ft {i:03d}] train +/- {rp.mean():+.3f}/{rm.mean():+.3f} "
              f"gate={sc[0]}/{n_eval} reward {sc[1]:+.3f} "
              f"pitch {np.degrees(r0['pitch_rad']):.0f} "
              f"up_z {r0['up_z']:+.3f} (best {best[0]})", flush=True)
        if best[0][0] == n_eval and i >= 4:
            print("[backflip-ft] gate satisfied on all scenarios, stopping",
                  flush=True)
            break

    (n_ok_best, ret), W_best, on_best = best
    gate_ok = n_ok_best == n_eval

    if args.robust:
        # held-out validation: fresh randomized seeds + the nominal gate.
        # Save only a policy that keeps the nominal 4/4 and full rotation
        # on every fresh scenario (the strict-upright fraction is the
        # reported robustness number, not a save gate — the linear class
        # plateaus near ~50%).
        Wb = jnp.asarray(W_best)
        nom_env = QuadrupedEnv(EnvConfig(
            enable_springs=True, task_env="BACKFLIP",
            observation_space_mode="ARS_BACKFLIP",
            action_space_mode="SYMMETRIC", obs_noise=False, max_ep_len=4.0))
        nom_w = wr.LandingWrapperBackflip(nom_env, variant=variant)
        nom = eval_backflip(nom_env, nom_w, Wb, on_best, n_seeds=4)
        nom_ok = sum(r["pitch_rad"] >= 2 * np.pi - 0.1 and r["up_z"] > 0.85
                     and r["z"] > 0.15 for r in nom)
        # fresh held-out scenario seeds through _episode
        val = []
        for s in range(12):
            st, total = _episode(eval_env, eval_w, Wb, on_best,
                                 77000 + s, max_steps=120)
            R = np.asarray(sp.quat_to_mat(st.robot.quat))
            val.append((float(st.task.max_pitch_bf) >= 2 * np.pi - 0.1,
                        float(R[2, 2]) > 0.85 and float(st.robot.pos[2]) > 0.15))
        rot_ok = sum(v[0] for v in val)
        up_ok = sum(v[1] for v in val)
        print(f"[validation] nominal {nom_ok}/4, fresh rotation {rot_ok}/12, "
              f"fresh upright {up_ok}/12", flush=True)
        gate_ok = nom_ok == 4 and rot_ok == 12
        if not gate_ok:
            print("[validation] FAILED save bars (nominal 4/4 + rotation "
                  "12/12) — not saving", flush=True)
            sys.exit(1)
    os.makedirs("examples/policies", exist_ok=True)
    out = ("examples/policies/backflip_ars_robust.npz" if args.robust
           else "examples/policies/backflip_ars.npz")
    np.savez(out, W=np.asarray(W_best), mean=np.asarray(on_best.mean),
             var=np.asarray(on_best.var), count=np.asarray(on_best.count),
             ret=ret, gate_ok=gate_ok)
    print(f"saved {out} (gate={n_ok_best}/{n_eval}, "
          f"mean true reward {ret:+.3f})", flush=True)
    sys.exit(0 if gate_ok else 1)

# ---- forward: plain ARS on the sparse JUMPING_FORWARD task --------------
cfg = EnvConfig(
    enable_springs=True, task_env="JUMPING_FORWARD",
    observation_space_mode="ARS_BASIC",
    action_space_mode="SYMMETRIC", settling_steps=600, max_ep_len=1.9)
env = QuadrupedEnv(cfg)
ars = ARSTrainer(env, ARSConfig(
    n_directions=16, top_directions=8, episode_steps=200,
    reset_bank_size=8, step_size=0.02, delta_std=0.03))
ts = ars.init(jax.random.PRNGKey(0))
best = (-9.9, ts.W, ts.obs_norm)
for i in range(args.iters):
    ts, m = ars.train_step(ts)
    ev = ars.evaluate(ts, n_episodes=4)
    r = float(ev["return_mean"])
    if r > best[0]:
        best = (r, ts.W, ts.obs_norm)
    if i % 10 == 9:
        print(f"[forward {i:03d}] eval {r:+.3f} "
              f"apex {float(ev['max_height']):.3f} "
              f"fwd {float(ev['max_fwd']):.3f} (best ret {best[0]:+.3f})",
              flush=True)

r, W, on = best
os.makedirs("examples/policies", exist_ok=True)
out = "examples/policies/forward_ars.npz"
np.savez(out, W=np.asarray(W), mean=np.asarray(on.mean),
         var=np.asarray(on.var), count=np.asarray(on.count), ret=r)
print(f"saved {out} (best eval return {r:+.3f})")
