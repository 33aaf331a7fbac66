"""String-keyed registries — the reference's config vocabulary in one place.

Equivalent of utils/base_collection.py + the six registries built on it
(task / sensor-suite / motor-mode / action-space / randomizer / camera,
quadruped_gym_env.py:52-70). Here the registries are plain dicts defined in
their home modules; this module re-exports them and provides the lookup with
the same error behavior (unknown key -> helpful error)."""

from __future__ import annotations

from quadruped_springs_tpu.control.interfaces import ACTION_MODES, MOTOR_MODES
from quadruped_springs_tpu.env.randomizers import RANDOMIZER_MODES
from quadruped_springs_tpu.sensors.sensors import SUITES
from quadruped_springs_tpu.tasks.tasks import TASKS
from quadruped_springs_tpu.utils.camera import CAMERA_MODES

REGISTRIES = {
    "task_env": sorted(TASKS),
    "observation_space_mode": sorted(SUITES),
    "motor_control_mode": list(MOTOR_MODES),
    "action_space_mode": list(ACTION_MODES),
    "env_randomizer_mode": sorted(RANDOMIZER_MODES),
    "camera_mode": sorted(CAMERA_MODES),
}


def validate(axis: str, key: str) -> str:
    options = REGISTRIES.get(axis)
    if options is None:
        raise KeyError(f"unknown config axis {axis!r}; axes: {sorted(REGISTRIES)}")
    if key not in options:
        raise KeyError(f"{key!r} is not a registered {axis}; options: {options}")
    return key
