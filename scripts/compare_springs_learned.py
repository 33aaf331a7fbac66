"""Budget-matched LEARNED springs-vs-rigid comparison (ARS, sparse jump).

The reference paper's central claim is that parallel-elastic springs
improve explosive jumping, and its repo trains the SAME learning stack
on both robot configs (configs_go1_with_springs.py vs
configs_go1_without_springs.py, selected by quadruped_gym_env.py:98-102)
to make that comparison in the learned setting. Round 4 measured the
claim mechanically (scripts/compare_springs.py: best-of-8 MPPI plans
executed open-loop — springs 1.142 m vs rigid 0.801 m, +42.6%); this
script measures it the way the reference does — by LEARNING: the
two-stage pipeline's ARS jump stage (examples/train_two_stage.py stage
1a, identical ARSConfig/seed/budget) is run on both configs with NO
early stop, and each config's apex curve and best apex are recorded.

Both runs share every hyperparameter; the only difference is
EnvConfig.enable_springs, which swaps the full reference config module
(PD gains included — kp=75 vs [55,60,60], go1_params.py:217-251, cited
from configs_go1_*.py).

Run:  python scripts/compare_springs_learned.py [--iters 250]
      [--seed 0] [--out docs/springs_vs_rigid_learned.json]
Writes a JSON with one entry per config: the full eval curve, best
apex, and iterations-to-threshold landmarks.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def run_config(enable_springs: bool, iters: int, seed: int) -> dict:
    import jax

    from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
    from quadruped_springs_tpu.train.ars import ARSConfig, ARSTrainer

    env = QuadrupedEnv(EnvConfig(
        enable_springs=enable_springs, task_env="JUMPING_IN_PLACE",
        observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
        settling_steps=600, max_ep_len=1.0))
    ars = ARSTrainer(env, ARSConfig(
        n_directions=16, top_directions=8, episode_steps=110,
        reset_bank_size=8, step_size=0.02, delta_std=0.03))
    ts = ars.init(jax.random.PRNGKey(seed))
    tag = "springs" if enable_springs else "rigid"
    curve, best_apex = [], -1.0
    t0 = time.time()
    for i in range(iters):
        ts, m = ars.train_step(ts)
        ev = ars.evaluate(ts, n_episodes=4)
        apex = float(ev["max_height"])
        best_apex = max(best_apex, apex)
        curve.append({"iter": i, "mean_return": float(m["mean_return"]),
                      "eval_return": float(ev["return_mean"]),
                      "eval_max_height": apex})
        if i % 10 == 9:
            print(f"[{tag} {i:03d}] train {m['mean_return']:+.3f} "
                  f"apex {apex:.3f} m (best {best_apex:.3f})", flush=True)

    def iters_to(thresh):
        for c in curve:
            if c["eval_max_height"] >= thresh:
                return c["iter"]
        return None

    return {"enable_springs": enable_springs,
            "best_apex_m": best_apex,
            "final10_apex_mean_m": sum(
                c["eval_max_height"] for c in curve[-10:]) / 10.0,
            "iters_to_0p5m": iters_to(0.5),
            "iters_to_0p75m": iters_to(0.75),
            "wall_s": round(time.time() - t0, 1),
            "curve": curve}


def main():
    ap = argparse.ArgumentParser()
    # 150 is the committed comparison budget (docs/springs_vs_rigid_learned
    # .json, pinned by tests/test_artifacts.py) — keep the default in sync
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="docs/springs_vs_rigid_learned.json")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    results = {"task": "JUMPING_IN_PLACE", "trainer": "ARS (stage 1a of "
               "examples/train_two_stage.py, identical budget, no early "
               "stop)", "iters": args.iters, "seed": args.seed}
    for springs in (True, False):
        key = "springs" if springs else "rigid"
        results[key] = run_config(springs, args.iters, args.seed)
        print(f"== {key}: best apex {results[key]['best_apex_m']:.3f} m "
              f"in {results[key]['wall_s']} s", flush=True)
    s, r = results["springs"]["best_apex_m"], results["rigid"]["best_apex_m"]
    results["springs_advantage_pct"] = round(100.0 * (s - r) / r, 1)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")
    print(json.dumps({k: results[k] for k in
                      ("springs_advantage_pct",)} |
                     {"springs_best_apex_m": s, "rigid_best_apex_m": r}))


if __name__ == "__main__":
    main()
