"""Numeric sanitizers — the jit-purity / race-detection analog (SURVEY §5).

The reference's only QA is static lint (Makefile pytype/flake8). In a
batched numeric framework the failure modes are NaN/Inf contamination and
silently diverged scenarios; these helpers surface them without killing a
batch:

  * ``checked(fn)`` — wrap a jittable fn with ``checkify`` so NaN/div
    errors become returned, inspectable errors instead of silent garbage.
  * ``finite_mask(tree)`` — per-batch-element all-finite mask over a pytree
    (the divergence mask used by parallel/scenarios.sharded_solve).
  * ``assert_finite(tree)`` — host-side hard assert for tests/debugging.
  * ``debug_nans()`` — context manager flipping jax_debug_nans on.
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def checked(fn: Callable, errors=checkify.float_checks):
    """checkify-wrapped fn: returns (error, value); error.throw() raises."""
    return checkify.checkify(fn, errors=errors)


def finite_mask(tree, batch_axis: int = 0) -> jnp.ndarray:
    """(B,) bool: True where every leaf element of batch member b is finite."""
    leaves = jax.tree.leaves(tree)
    masks = []
    for leaf in leaves:
        axes = tuple(i for i in range(leaf.ndim) if i != batch_axis)
        masks.append(jnp.all(jnp.isfinite(leaf), axis=axes))
    return jnp.stack(masks, axis=0).all(axis=0)


def assert_finite(tree, name: str = "tree") -> None:
    bad = [
        str(i) for i, leaf in enumerate(jax.tree.leaves(tree))
        if not bool(jnp.all(jnp.isfinite(leaf)))
    ]
    if bad:
        raise FloatingPointError(
            f"{name}: non-finite values in leaves {', '.join(bad)}")


@contextlib.contextmanager
def debug_nans():
    """Enable eager NaN detection inside the scope (debugging only —
    disables some fusions)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
