"""Generate rigid-contact LCP-oracle golden traces for the four jump tasks
and report the compliant simulator's deviation against each (the
BASELINE.json fidelity gate: max joint-torque deviation < 2% of the torque
limit).

Usage:  python scripts/make_oracle_traces.py [--out tests/data] [--verify-only]
Writes  oracle_<task>.qsts per task + prints a JSON report per task.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from quadruped_springs_tpu.runtime import trajstore  # noqa: E402
from quadruped_springs_tpu.utils import verification as V  # noqa: E402

TASKS = ("JUMPING_IN_PLACE", "JUMPING_FORWARD", "BACKFLIP",
         "CONTINUOUS_JUMPING_FORWARD")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/data")
    ap.add_argument("--verify-only", action="store_true")
    ap.add_argument("--tasks", nargs="*", default=list(TASKS))
    ap.add_argument("--no-springs", action="store_true",
                    help="rigid baseline (configs_go1_without_springs.py "
                         "gains/limits); writes oracle_<task>_nospring.qsts")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    reports = {}
    suffix = "_nospring" if args.no_springs else ""
    for task in args.tasks:
        path = os.path.join(args.out, f"oracle_{task.lower()}{suffix}.qsts")
        env = V.fidelity_env(task, enable_springs=not args.no_springs)
        if not args.verify_only:
            rows = V.record_oracle_trace(env, V.task_action_script(task))
            trajstore.write(path, np.asarray(rows, np.float32))
            print(f"[{task}] oracle trace: {rows.shape[0]} steps -> {path}")
        rep = V.verify_against_trace(env, path, key)
        reports[task] = rep
        print(f"[{task}] {json.dumps(rep)}")
    ok = all(r["pass"] for r in reports.values())
    print(json.dumps({"all_pass": ok,
                      "max_static_flight_dev": max(
                          r["static_flight_max_dev_frac"]
                          for r in reports.values())}))


if __name__ == "__main__":
    main()
