"""Device mesh + distributed init — the communication layer.

The reference has no distributed execution at all (single PyBullet client,
n_envs=1 VecEnv, load_model.py:113). Here scaling is first-class: scenario
batches shard over a ('dcn', 'ici') mesh — hosts × chips-per-host — with
XLA collectives riding ICI within a host and DCN across hosts.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SCENARIO_AXES = ("dcn", "ici")


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """jax.distributed bootstrap for multi-host slices (no-op single host)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator, num_processes, process_id)


def scenario_mesh(devices=None) -> Mesh:
    """Mesh with hosts on 'dcn' and per-host chips on 'ici'.

    On a single host this is a (1, n_local) mesh; on a v5p-16 slice with 2
    hosts it becomes (2, 8) and scenario reductions psum over 'ici' first.
    """
    devices = jax.devices() if devices is None else devices
    n_hosts = max(jax.process_count(), 1)
    per_host = len(devices) // n_hosts
    arr = np.asarray(devices).reshape(n_hosts, per_host)
    return Mesh(arr, SCENARIO_AXES)


def scenario_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dimension sharded over both mesh axes (fully data-parallel)."""
    return NamedSharding(mesh, P(SCENARIO_AXES))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
