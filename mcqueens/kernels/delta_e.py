"""Gather-free delta-E: the arithmetic identity behind the Pallas kernel.

On this TPU target, per-lane gather/scatter is unavailable inside kernels
(Mosaic exposes only full-shape ``dynamic_gather`` and no scatter), so the
count-table O(1) delta-E cannot live in VMEM.  Instead the kernel evaluates
delta-E against the whole board in one fused vector pass using a *disjointness
identity*:

For distinct (i, j) columns the six board-mode attack relations are mutually
exclusive (SURVEY §2.1), so the 0/1 attack predicate equals an integer SUM of
relation indicators.  Writing z=(dk==0), t1=(dj==dk), t2=(di==dk), a=(di==0),
b=(dj==0), e=(di==dj):

    att(k) = z*(a+b+e) + b*t2 + a*t1 + e*t1

and the move delta telescopes into three lane-wise dot products that share all
(i, j)-dependent terms between the old and new candidate:

    dE = sum_lanes [ s*(z_n - z_o) + b*(t2_n - t2_o) + (a+e)*(t1_n - t1_o) ] + 6

where s = a+b+e.  The +6 cancels the moving queen's own lane, whose
contribution is the constant -6 (a=b=e=1 so s=3, ae=2, and z_o=t1_o=t2_o=1,
z_n=t1_n=t2_n=0 because new_k != old_k).  Equality with the count-table delta
(:func:`mcqueens.core.tables.board_delta_e`) is verified exhaustively in
``tests/test_pallas.py``.

This file keeps a pure-jnp reference implementation of the identity so the
kernel's math is unit-testable without Mosaic.
"""

from __future__ import annotations

import jax.numpy as jnp


def board_delta_e_dense(heights_flat, i_grid, j_grid, i, j, old_k, new_k):
    """delta-E of moving column (i, j) from old_k to new_k (!= old_k).

    Args:
        heights_flat: (..., N*N) integer heights (any int dtype).
        i_grid, j_grid: (N*N,) cell coordinates (constants).
        i, j, old_k, new_k: (..., 1) per-chain scalars.

    Returns:
        (..., 1) int32 delta-E.  Shapes follow the kernel layout: chains on
        the leading axis, board cells on the lane axis.
    """
    di = jnp.abs(i_grid - i)
    dj = jnp.abs(j_grid - j)
    a = (di == 0).astype(jnp.int32)
    b = (dj == 0).astype(jnp.int32)
    e = (di == dj).astype(jnp.int32)
    s = a + b + e
    ae = a + e

    dko = jnp.abs(heights_flat - old_k)
    dkn = jnp.abs(heights_flat - new_k)
    dz = (dkn == 0).astype(jnp.int32) - (dko == 0).astype(jnp.int32)
    dt1 = (dj == dkn).astype(jnp.int32) - (dj == dko).astype(jnp.int32)
    dt2 = (di == dkn).astype(jnp.int32) - (di == dko).astype(jnp.int32)

    integrand = s * dz + b * dt2 + ae * dt1
    return jnp.sum(integrand, axis=-1, keepdims=True, dtype=jnp.int32) + 6
