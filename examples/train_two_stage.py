"""Two-stage learning pipeline, end-to-end — the reference methodology
(load_model.py:45-47 / arXiv:2309.09682): ARS learns an explosive jump,
its best episode is recorded as a demonstration, PPO imitates the
demonstration (JUMPING_IN_PLACE_DEMO), and PPO fine-tunes on the dense
task reward (JUMPING_IN_PLACE_PPO) warm-started from the imitation
weights.

Run:  python examples/train_two_stage.py [--ars-iters 20] [--ppo-iters 15]
      [--out examples/out]
Writes <out>/two_stage_results.json + reward-curve PNGs. CPU-friendly
settings by default (a few minutes); scale the iteration counts up on a
real chip.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ars-iters", type=int, default=20)
    ap.add_argument("--ppo-imitate-iters", type=int, default=12)
    ap.add_argument("--ppo-finetune-iters", type=int, default=12)
    ap.add_argument("--out", default="examples/out")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    os.makedirs(args.out, exist_ok=True)

    from quadruped_springs_tpu.env import demo_pipeline as dp
    from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
    from quadruped_springs_tpu.train import normalize as vnorm
    from quadruped_springs_tpu.train.ars import ARSConfig, ARSTrainer
    from quadruped_springs_tpu.train.networks import linear_policy_apply
    from quadruped_springs_tpu.train.ppo import PPOConfig, PPOTrainer
    from quadruped_springs_tpu.utils import demo as demo_util

    results = {}
    t_start = time.time()

    # ---- Stage 1: ARS on the sparse jumping task ------------------------
    # max_ep_len must sit INSIDE the rollout horizon: the sparse task pays
    # its reward at episode end (robot_tasks.py:31-57), so episodes that
    # never finish within episode_steps would give ARS an all-zero signal.
    env = QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="JUMPING_IN_PLACE",
        observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
        settling_steps=600, max_ep_len=1.0))
    ars = ARSTrainer(env, ARSConfig(
        n_directions=8, top_directions=4, episode_steps=110,
        reset_bank_size=8, step_size=0.03, delta_std=0.04))
    ts = ars.init(jax.random.PRNGKey(0))
    curve = []
    for i in range(args.ars_iters):
        ts, m = ars.train_step(ts)
        ev = ars.evaluate(ts, n_episodes=4)
        curve.append({"iter": i, "mean_return": float(m["mean_return"]),
                      "eval_return": float(ev["return_mean"]),
                      "eval_max_height": float(ev["max_height"])})
        print(f"[ARS {i:02d}] train {m['mean_return']:+.3f}  "
              f"eval {ev['return_mean']:+.3f}  "
              f"apex {ev['max_height']:.3f} m", flush=True)
    results["ars_curve"] = curve
    first, last = curve[0], curve[-1]
    results["ars_improved"] = bool(last["eval_return"] > first["eval_return"])
    results["ars_final_apex_m"] = last["eval_max_height"]

    # ---- Stage 2: record the demonstration ------------------------------
    W, on = ts.W, ts.obs_norm

    def expert(obs):
        return linear_policy_apply(W, vnorm.normalize(on, obs))

    rows, valid, _ = jax.jit(
        lambda k: dp.collect_demo(env, expert, k, max_steps=150)
    )(jax.random.PRNGKey(7))
    demo_path = os.path.join(args.out, "demo_jip.qsts")
    dp.save_demo_library(demo_path, rows, valid)
    demo = dp.load_demo_library(demo_path)
    results["demo_steps"] = int(demo.shape[0])
    print(f"[demo] recorded {demo.shape[0]} steps -> {demo_path}")

    # ---- Stage 3: PPO imitation on the *_DEMO task -----------------------
    acts = demo_util.demo_actions(demo, env.action_dim)
    demo_env = QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="JUMPING_IN_PLACE_DEMO",
        observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
        settling_steps=600, max_ep_len=2.0), demo_actions=acts)
    ppo_cfg = PPOConfig(n_envs=16, segment_len=64, reset_bank_size=16)
    ppo_im = PPOTrainer(demo_env, ppo_cfg)
    ps = ppo_im.init(jax.random.PRNGKey(1))
    curve_im = []
    for i in range(args.ppo_imitate_iters):
        ps, m = ppo_im.train_step(ps)
        curve_im.append({"iter": i, "mean_reward": float(m["mean_reward"])})
        print(f"[PPO-imitate {i:02d}] reward {m['mean_reward']:+.4f} "
              f"kl {m['approx_kl']:+.4f}", flush=True)
    results["ppo_imitate_curve"] = curve_im
    results["ppo_imitate_improved"] = bool(
        np.mean([c["mean_reward"] for c in curve_im[-3:]])
        > np.mean([c["mean_reward"] for c in curve_im[:3]]))

    # ---- Stage 4: PPO fine-tune on the dense task, warm-started ---------
    ft_env = QuadrupedEnv(EnvConfig(
        enable_springs=True, task_env="JUMPING_IN_PLACE_PPO",
        observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
        settling_steps=600, max_ep_len=2.0))
    ppo_ft = PPOTrainer(ft_env, ppo_cfg)
    fs = ppo_ft.init(jax.random.PRNGKey(2))
    # warm start: imitation weights + obs statistics
    fs = fs.replace(params=ps.params, obs_norm=ps.obs_norm)
    curve_ft = []
    for i in range(args.ppo_finetune_iters):
        fs, m = ppo_ft.train_step(fs)
        ev = ppo_ft.evaluate(fs, n_episodes=4, max_steps=120)
        curve_ft.append({"iter": i, "mean_reward": float(m["mean_reward"]),
                         "eval_max_height": float(ev["max_height"])})
        print(f"[PPO-finetune {i:02d}] reward {m['mean_reward']:+.4f} "
              f"apex {ev['max_height']:.3f} m", flush=True)
    results["ppo_finetune_curve"] = curve_ft
    results["wall_s"] = round(time.time() - t_start, 1)

    out_json = os.path.join(args.out, "two_stage_results.json")
    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_json}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axs = plt.subplots(1, 3, figsize=(13, 3.5))
        axs[0].plot([c["eval_return"] for c in curve])
        axs[0].set_title("ARS eval return")
        axs[1].plot([c["mean_reward"] for c in curve_im])
        axs[1].set_title("PPO imitation reward")
        axs[2].plot([c["mean_reward"] for c in curve_ft])
        axs[2].set_title("PPO finetune reward")
        for ax in axs:
            ax.set_xlabel("iteration")
        fig.savefig(os.path.join(args.out, "two_stage_curves.png"),
                    dpi=100, bbox_inches="tight")
        print("wrote curves png")
    except Exception as e:  # plotting is best-effort
        print("plot skipped:", e)


if __name__ == "__main__":
    main()
