"""Checkpoint / resume — orbax-backed pytree persistence.

The reference's artifact surface is SB3 `best_model.zip` + VecNormalize
stats + args.yml, all produced/consumed externally (load_model.py:62-63,
109-125). Here any training / solver state is an explicit pytree, so
checkpointing is uniform: trainer states (params, optimizer, obs-norm),
iLQR warm-start caches, demo trajectory libraries.
"""

from __future__ import annotations

import os

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save(path: str, tree) -> None:
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()
    else:
        flat, treedef = jax.tree.flatten(tree)
        np.savez(path + ".npz", treedef=str(treedef),
                 **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)})


def restore(path: str, template):
    """Restore into the structure of `template` (shapes/dtypes from it)."""
    path = os.path.abspath(path)
    if _HAVE_ORBAX and os.path.isdir(path):
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, template)
    data = np.load(path + ".npz", allow_pickle=False)
    flat, treedef = jax.tree.flatten(template)
    leaves = [data[f"leaf_{i}"] for i in range(len(flat))]
    return jax.tree.unflatten(treedef, leaves)
