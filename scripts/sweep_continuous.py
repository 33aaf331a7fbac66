"""Continuous-jumping quality sweep (VERDICT r3 next #3): tune the
receding-horizon MPPI so the committed KPI trace contains real jumps by
the task's OWN per-jump scoring (JumpingForwardContinuous3,
robot_tasks.py:168-212: perf = 0.7*fwd/0.6 + 0.3*h/0.45, good-jump bound
0.7), not 30 micro-hops.

Levers: planner horizon (H=25 cannot span a full ~0.5 s hop cycle — the
round-3 root cause), tracked forward speed v_ref, apex target z_ref.

Usage: python scripts/sweep_continuous.py [--cpu] [--seconds 6]
Writes docs/continuous_sweep_r4.jsonl (one JSON line per config).
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
ap.add_argument("--seconds", type=float, default=6.0)
ap.add_argument("--out", default="docs/continuous_sweep_r4.jsonl")
args = ap.parse_args()
if args.cpu:
    jax.config.update("jax_platforms", "cpu")

from examples.run_continuous_jumping_mpc import run  # noqa: E402

CONFIGS = [
    # label, horizon, overrides
    ("r3-baseline-H25", 25, ()),
    ("H40", 40, ()),
    ("H40-v1.8", 40, (("v_ref", 1.8),)),
    ("H40-v2.2", 40, (("v_ref", 2.2),)),
    ("H40-v1.8-z0.55", 40, (("v_ref", 1.8), ("z_ref", 0.55))),
    ("H50-v1.8", 50, (("v_ref", 1.8),)),
]

ROUND2 = [
    ("H40-v2.6", 40, (("v_ref", 2.6),)),
    ("H50-v2.2", 50, (("v_ref", 2.2),)),
    ("H40-v2.2-K64", 40, (("v_ref", 2.2),)),   # n_samples=64 below
    ("H25-v2.2", 25, (("v_ref", 2.2),)),
]

rows = []
todo = ROUND2 if os.environ.get("SWEEP_ROUND") == "2" else CONFIGS
for label, H, ov in todo:
    t0 = time.time()
    out, _ = run(seconds=args.seconds, replan_every=2, verbose=False,
                 horizon=H, n_samples=64 if label.endswith("K64") else 32,
                 cost_overrides=ov)
    perf = out["per_jump_performance"]
    row = {
        "label": label, "horizon": H, "overrides": dict(ov),
        "n_jumps": out["n_jumps"], "good_jumps": out["good_jumps"],
        "mean_perf": round(sum(perf) / max(len(perf), 1), 3),
        "best_perf": max(perf) if perf else 0.0,
        "n_perf_ge_085": sum(p >= 0.85 for p in perf),
        "total_fwd_m": out["total_fwd_m"], "max_z_m": out["max_z_m"],
        "sim_seconds": out["sim_seconds"],
        "wall_s": round(time.time() - t0, 1),
    }
    rows.append(row)
    print(json.dumps(row), flush=True)
    with open(args.out, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
print(f"wrote {args.out}")
