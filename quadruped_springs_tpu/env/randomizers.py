"""Domain randomization as pure samplers: key -> ScenarioParams pytree.

TPU-native re-design of env/env_randomizers/* : instead of mutating a
PyBullet body at reset, a `ScenarioParams` pytree is sampled per scenario
and fed into `build_model` / the spring law / the contact model — so the
whole randomization axis is just another vmapped batch dimension.

Mirrored behavior (env_randomizer.py):
  * EnvRandomizerMasses (:19-83): ±10% leg masses (same draw for all legs),
    0-1 kg offset mass block at ±(0.1, 0, 0.1) m from the trunk, base mass
    compensated so total mass stays constant.
  * EnvRandomizerSprings (:86-122): ±10% spring stiffness/damping.
  * Curriculum variants (:125-276): ranges interpolate linearly from the
    nominal values to the curriculum extremes (offset mass up to 4 kg,
    spring errors up to 30%) with level ∈ [0,1].
  * EnvRandomizerGround (:279-291): lateral friction μ ∈ [0.5, 1].

Registry keys match env_randomizer_collection.py:15-21.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from quadruped_springs_tpu.models.go1_params import (
    FOOT_MASS,
    LEG_MASSES,
    NUM_LEGS,
    TRUNK_MASS,
    Go1Config,
    build_model,
)

# nominal ranges (env_randomizer.py:5-16)
LEG_MASS_ERR = 0.1
SPRING_ERR = (0.1, 0.1, 0.1)
MAX_MASS_OFFSET = 1.0
MAX_POS_MASS_OFFSET = jnp.array([0.1, 0.0, 0.1])
# curriculum extremes (env_randomizer.py:125-276)
CURRICULUM_MAX_MASS_OFFSET = 4.0
CURRICULUM_SPRING_ERR = 0.3
FRICTION_RANGE = (0.5, 1.0)


@struct.dataclass
class ScenarioParams:
    """Everything a scenario can randomize. Feed into build_model + env."""
    leg_masses: jnp.ndarray        # (3,) hip/thigh/calf (same all legs)
    foot_masses: jnp.ndarray       # (4,)
    base_mass: jnp.ndarray         # ()
    offset_mass: jnp.ndarray       # ()
    offset_pos: jnp.ndarray        # (3,)
    spring_stiffness: jnp.ndarray  # (3,)
    spring_damping: jnp.ndarray    # (3,)
    friction: jnp.ndarray          # ()


def nominal_params(cfg: Go1Config) -> ScenarioParams:
    return ScenarioParams(
        leg_masses=jnp.asarray(LEG_MASSES, jnp.float32),
        foot_masses=jnp.full((NUM_LEGS,), FOOT_MASS, jnp.float32),
        base_mass=jnp.asarray(TRUNK_MASS, jnp.float32),
        offset_mass=jnp.asarray(0.0, jnp.float32),
        offset_pos=jnp.zeros(3, jnp.float32),
        spring_stiffness=cfg.spring_stiffness,
        spring_damping=cfg.spring_damping,
        friction=jnp.asarray(1.0, jnp.float32),
    )


def _sample_masses(key, level: jnp.ndarray):
    k1, k2, k3 = jax.random.split(key, 3)
    leg = jnp.asarray(LEG_MASSES) * jax.random.uniform(
        k1, (3,), minval=1.0 - LEG_MASS_ERR, maxval=1.0 + LEG_MASS_ERR
    )
    max_offset = MAX_MASS_OFFSET + level * (CURRICULUM_MAX_MASS_OFFSET - MAX_MASS_OFFSET)
    offset_mass = jax.random.uniform(k2, (), minval=0.0, maxval=max_offset)
    offset_pos = jax.random.uniform(
        k3, (3,), minval=-MAX_POS_MASS_OFFSET, maxval=MAX_POS_MASS_OFFSET
    )
    # keep the total mass constant (env_randomizer.py:61-65)
    total = TRUNK_MASS + 4 * (jnp.sum(jnp.asarray(LEG_MASSES)) + FOOT_MASS)
    base_mass = total - offset_mass - 4 * jnp.sum(leg) - 4 * FOOT_MASS
    return leg, offset_mass, offset_pos, base_mass


def _sample_springs(cfg: Go1Config, key, level: jnp.ndarray):
    err = jnp.asarray(SPRING_ERR) + level * (CURRICULUM_SPRING_ERR - jnp.asarray(SPRING_ERR))
    k1, k2 = jax.random.split(key)
    k = cfg.spring_stiffness * jax.random.uniform(k1, (3,), minval=1 - err, maxval=1 + err)
    d = cfg.spring_damping * jax.random.uniform(k2, (3,), minval=1 - err, maxval=1 + err)
    return k, d


def _sample_friction(key):
    return jax.random.uniform(key, (), minval=FRICTION_RANGE[0], maxval=FRICTION_RANGE[1])


# registry: mode -> which axes are randomized (env_randomizer_collection.py)
RANDOMIZER_MODES = {
    # every mode includes the ground randomizer (collection default)
    "GROUND_RANDOMIZER": ("ground",),
    "MASS_RANDOMIZER": ("mass", "ground"),
    "SPRING_RANDOMIZER": ("spring", "ground"),
    "TEST_RANDOMIZER": ("mass", "spring", "ground"),
    "TEST_RANDOMIZER_CURRICULUM": ("mass_curriculum", "spring_curriculum", "ground"),
    "NONE": (),
}


def is_curriculum(mode: str) -> bool:
    return any("curriculum" in ax for ax in RANDOMIZER_MODES[mode])


def sample_scenario(cfg: Go1Config, mode: str, key: jax.Array,
                    curriculum_level=0.0) -> ScenarioParams:
    """Sample one scenario's parameters. vmap over keys for batches."""
    axes = RANDOMIZER_MODES[mode]
    p = nominal_params(cfg)
    level = jnp.asarray(curriculum_level, jnp.float32)
    k_mass, k_spring, k_fric = jax.random.split(key, 3)
    if "mass" in axes or "mass_curriculum" in axes:
        lvl = level if "mass_curriculum" in axes else jnp.asarray(0.0)
        leg, off_m, off_p, base = _sample_masses(k_mass, lvl)
        p = p.replace(leg_masses=leg, offset_mass=off_m, offset_pos=off_p,
                      base_mass=base)
    if ("spring" in axes or "spring_curriculum" in axes) and cfg.enable_springs:
        lvl = level if "spring_curriculum" in axes else jnp.asarray(0.0)
        k, d = _sample_springs(cfg, k_spring, lvl)
        p = p.replace(spring_stiffness=k, spring_damping=d)
    if "ground" in axes:
        p = p.replace(friction=_sample_friction(k_fric))
    return p


def model_from_params(p: ScenarioParams):
    """Build the dynamics model for a scenario (vmappable)."""
    return build_model(
        leg_masses=p.leg_masses,
        foot_masses=p.foot_masses,
        base_mass=p.base_mass,
        offset_mass=p.offset_mass,
        offset_pos=p.offset_pos,
    )
