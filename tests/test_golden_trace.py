"""Cross-version physics regression gate: replay the committed golden trace
(recorded from this simulator's CPU reference implementation) and require the
BASELINE.json acceptance metric — max joint-torque deviation < 2% of the
torque limit — plus state-level agreement.

If a deliberate physics change breaks this, re-record with:
  python -m quadruped_springs_tpu.utils.verification record \
      tests/data/golden_jump_in_place.qsts
and justify the change in the commit message.
"""

import os

import jax

from quadruped_springs_tpu.utils import verification as V

TRACE = os.path.join(os.path.dirname(__file__), "data",
                     "golden_jump_in_place.qsts")


def test_committed_golden_trace_replays_within_tolerance():
    env = V._default_env()
    report = V.verify_against_trace(env, TRACE, jax.random.PRNGKey(0))
    assert report["steps"] == 100
    assert report["pass"], report
    assert report["max_height_dev_m"] < 0.02, report
    assert report["max_joint_dev_rad"] < 0.05, report
