"""Golden-trace verification CLI: record → verify roundtrip must pass at
0 deviation against itself (determinism gate) and catch perturbations."""

import jax
import jax.numpy as jnp
import numpy as np

from quadruped_springs_tpu.env.env import EnvConfig, QuadrupedEnv
from quadruped_springs_tpu.runtime import trajstore
from quadruped_springs_tpu.utils import verification as ver


def _env(**kw):
    d = dict(enable_springs=True, task_env="JUMPING_IN_PLACE",
             observation_space_mode="ARS_BASIC", action_space_mode="SYMMETRIC",
             obs_noise=False, settling_steps=200,
             env_randomizer_mode="NONE")
    d.update(kw)
    return QuadrupedEnv(EnvConfig(**d))


def test_record_verify_roundtrip(tmp_path):
    env = _env()
    key = jax.random.PRNGKey(0)
    actions = jnp.tile(env.get_init_action(), (20, 1))
    rows = ver.record_golden_trace(env, actions, key)
    path = str(tmp_path / "golden.qsts")
    trajstore.write(path, np.asarray(rows))

    report = ver.verify_against_trace(env, path, key)
    assert report["pass"], report
    # deterministic self-replay: all phase metrics at numerical zero
    assert report["static_flight_max_dev_frac"] < 1e-5
    assert report["dynamic_max_dev_frac"] < 1e-5
    assert report["max_torque_dev_frac_instant"] < 1e-5

    # perturbed sim (different spring stiffness) must be detected
    env2 = _env()
    env2.cfg = env2.cfg.replace(spring_stiffness=jnp.array([40.0, 40.0, 60.0]))
    report2 = ver.verify_against_trace(env2, path, key)
    assert (report2["static_flight_max_dev_frac"]
            > report["static_flight_max_dev_frac"])
