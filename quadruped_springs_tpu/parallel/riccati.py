"""Device-sharded parallel-in-time Riccati — the time axis over the mesh.

The within-chip parallel Riccati (solver/ilqr.py `_parallel_lqt_backward`)
composes conditional-value-function elements with an associative scan.
This module distributes that composition across devices: the horizon is
split into per-device blocks, each device runs a LOCAL reverse
associative scan, per-block composite elements are exchanged with ONE
`all_gather` over the mesh axis, each device folds the (tiny, D-element)
suffix of later blocks locally, and finally the next-knot value functions
cross the block boundary with ONE `ppermute` halo exchange — the
"per-knot QP blocks distributed over devices, reduced with ICI
collectives" component of SURVEY §2.8.

Honest positioning (see docs/PARITY.md): at this problem's scale
(n=37, H=50) even the within-chip parallel sweep is slower than the
sequential scan — each combine does 37x37 solves — so time-axis device
sharding is for LONG horizons (H in the thousands), where O(H/D + log)
depth wins; the scenario axis remains the right device-level parallelism
at H=50. Correctness is gated against the sequential sweep on the
8-device CPU mesh (tests/test_riccati_sharded.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from quadruped_springs_tpu.solver.ilqr import (
    lqt_combine,
    lqt_elements,
    lqt_gains,
    lqt_identity_element,
)


def sharded_lqt_backward(A, B, lx, lu, lxx, luu, lux, VxT, VxxT, reg,
                         mesh, axis: str = "ici"):
    """Backward LQ sweep with the TIME axis sharded over `mesh[axis]`.

    Args match solver/ilqr.lqt_elements; arrays carry the full horizon
    (H, ...) and are resharded internally. Returns (ks (H,m), Ks (H,m,n)).
    """
    H, n, m = A.shape[0], A.shape[1], B.shape[2]
    D = mesh.shape[axis]
    elems, R = lqt_elements(A, B, lx, lu, lxx, luu, lux, VxT, VxxT, reg)

    # pad H+1 elements to a multiple of D with identity elements (they
    # compose neutrally, so composites for real indices are unaffected)
    Hp = ((H + 1 + D - 1) // D) * D
    pad = Hp - (H + 1)
    ident = lqt_identity_element(n, A.dtype, (pad,))
    elems_p = tuple(jnp.concatenate([e, i], axis=0)
                    for e, i in zip(elems, ident))

    spec = P(axis)
    # spec per element array: shard leading (time) dim only
    especs = tuple(P(axis, *([None] * (e.ndim - 1))) for e in elems_p)

    def block_fn(*local_elems):
        # local reverse scan: composed[j] covers [j .. block_end]
        comp = jax.lax.associative_scan(lqt_combine, tuple(local_elems),
                                        reverse=True)
        # this block's total composite = composed[0]
        total = tuple(c[0] for c in comp)
        totals = tuple(
            jax.lax.all_gather(t, axis) for t in total)        # (D, ...)
        idx = jax.lax.axis_index(axis)

        # suffix_i = composite of blocks i+1..D-1 (identity for the last
        # block), folded with a tiny reverse loop over the D gathered
        # totals — the only sequential cross-device dependency.
        def body(j, acc):
            k = D - 1 - j
            t_k = tuple(t[k] for t in totals)
            nxt = lqt_combine(acc, t_k)   # acc covers [k+1..], t_k is [k]
            return tuple(
                jnp.where(k > idx, nn, aa) for nn, aa in zip(nxt, acc))

        ident1 = lqt_identity_element(n, A.dtype)
        suffix = jax.lax.fori_loop(0, D, body, ident1)

        # global composite for every local element: fold this block's
        # local composites with the suffix of all later blocks
        suffix_b = tuple(jnp.broadcast_to(s, c.shape)
                         for s, c in zip(suffix, comp))
        composed = jax.vmap(lqt_combine)(suffix_b, comp)

        S_loc = composed[4]          # (L, n, n)
        s_loc = -composed[3]         # (L, n)

        # halo: the NEXT knot's value function for the block's last
        # element lives in the next block's first slot
        perm = [(i + 1, i) for i in range(D - 1)] + [(0, D - 1)]
        S_halo = jax.lax.ppermute(S_loc[0], axis, perm)
        s_halo = jax.lax.ppermute(s_loc[0], axis, perm)
        S1 = jnp.concatenate([S_loc[1:], S_halo[None]], axis=0)
        s1 = jnp.concatenate([s_loc[1:], s_halo[None]], axis=0)
        return S1, s1

    fn = shard_map(block_fn, mesh=mesh, in_specs=especs,
                   out_specs=(spec, spec), check_vma=False)
    S1_p, s1_p = fn(*elems_p)
    # S1_p[k] = value at knot k+1; gains need knots 0..H-1
    S1 = S1_p[:H]
    s1 = s1_p[:H]
    return lqt_gains(S1, s1, A, B, R, lu, lux)
