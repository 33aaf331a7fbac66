"""Fresh-seed validation of the committed robust-backflip pair.

The committed artifacts (examples/policies/backflip_launch_robust.npz +
backflip_landing_mlp.npz) were SAVED conditional on passing the trainer's
own validation seeds 77000-77011 (scripts/train_backflip_robust_joint.py),
so re-checking those seeds is regression protection, not fresh evidence of
robustness (VERDICT r4 weak #4). This script runs the pair on seeds that
appear in NO trainer, probe, or save gate anywhere in the repo
(88000-88023 by default: training used 0-63, selection probes 20000+,
nominal checks 1000+, the save gate 77000-77011) and commits the verdict
to examples/out/backflip_robust_validation.json, which
tests/test_artifacts.py gates and tests/test_closed_loop_behaviors.py
samples its seeds from.

Scenario distribution: the full TEST_RANDOMIZER stack with observation
noise — the same distribution the reference trains its flips under
(reference env_randomizer.py:19-122: ±10% masses + offset block, ±10%
spring constants, ground friction mu in [0.5, 1]).

Run: python scripts/validate_backflip_robust.py [--cpu] [--n 24]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "examples", "out", "backflip_robust_validation.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=24)
    ap.add_argument("--seed0", type=int, default=88000)
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from examples.run_backflip_closed_loop import run_robust

    seeds = list(range(args.seed0, args.seed0 + args.n))
    t0 = time.time()
    results = run_robust(seeds, verbose=True)
    n_rot = sum(r["full_rotation"] for r in results)
    n_up = sum(r["upright"] for r in results)
    out = {
        "seeds": seeds,
        "seed_provenance": "never used by any trainer/probe/save gate "
                           "(train 0-63, probes 20000+, nominal 1000+, "
                           "save gate 77000-77011)",
        "randomizer": "TEST_RANDOMIZER + obs noise",
        "n": len(seeds),
        "full_rotation": n_rot,
        "strict_upright": n_up,
        "per_seed": results,
        "wall_s": round(time.time() - t0, 1),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in ("n", "full_rotation",
                                          "strict_upright", "wall_s")}))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
