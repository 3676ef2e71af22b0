"""Attack predicate and reference ("oracle") energy evaluation.

Problem: place queens in the N x N x N cube; two queens at p1=(i1,j1,k1) and
p2=(i2,j2,k2) *attack* each other iff any of 7 relations holds (reference
semantics, ``mcmc.py:144-169``):

    same_ij        i1==i2 and j1==j2          (axis line along k)
    same_ik        i1==i2 and k1==k2          (axis line along j)
    same_jk        j1==j2 and k1==k2          (axis line along i)
    plane_k_diag   k1==k2 and |di|==|dj|      (diagonal within a k-plane)
    plane_j_diag   j1==j2 and |di|==|dk|      (diagonal within a j-plane)
    plane_i_diag   i1==i2 and |dj|==|dk|      (diagonal within an i-plane)
    space_diag     |di|==|dj|==|dk|           (space diagonal)

Energy = number of attacking pairs (upper-triangular count).  The
board-constrained variant keeps exactly one queen per (i,j) column, so
``same_ij`` is impossible and is dropped (``mcmc_board.py:99-122``).

Everything here is pure jnp with static shapes — usable under ``vmap``/``jit``
— and is the *oracle* against which the O(1) incremental count-table kernel
(:mod:`mcqueens.core.tables`) is verified.  These O(N^4)/O(Q^2) forms run once
per chain at init and inside tests, never in the hot loop.
"""

from __future__ import annotations

import jax.numpy as jnp


def attacks(p1, p2, board_mode: bool = False):
    """Elementwise attack predicate between broadcastable coordinate triples.

    Args:
        p1, p2: tuples of (i, j, k) integer arrays (broadcastable).
        board_mode: drop the ``same_ij`` relation (board-constrained variant).

    Returns:
        Boolean array: True where the pair attacks.  NOTE: a queen "attacks"
        itself under this predicate; callers must mask the diagonal.
    """
    i1, j1, k1 = p1
    i2, j2, k2 = p2
    di = jnp.abs(i1 - i2)
    dj = jnp.abs(j1 - j2)
    dk = jnp.abs(k1 - k2)
    same_i = i1 == i2
    same_j = j1 == j2
    same_k = k1 == k2

    out = (
        (same_i & same_k)            # same_ik
        | (same_j & same_k)          # same_jk
        | (same_k & (di == dj))      # plane_k_diag
        | (same_j & (di == dk))      # plane_j_diag
        | (same_i & (dj == dk))      # plane_i_diag
        | ((di == dj) & (dj == dk))  # space_diag
    )
    if not board_mode:
        out = out | (same_i & same_j)  # same_ij
    return out


# ---------------------------------------------------------------------------
# Board-constrained variant: state is heights[(i, j)] = k, shape (N, N).
# ---------------------------------------------------------------------------


def _board_grids(N: int):
    ii = jnp.arange(N, dtype=jnp.int32)
    i_grid, j_grid = jnp.meshgrid(ii, ii, indexing="ij")
    return i_grid.reshape(-1), j_grid.reshape(-1)


def board_energy(heights) -> jnp.ndarray:
    """O(N^4) pairwise energy of a board state (oracle).

    Counts attacking pairs over all N^2 queens at (i, j, heights[i, j]).
    Reference: ``mcmc_board.py:82-122``.
    """
    N = heights.shape[-1]
    i_flat, j_flat = _board_grids(N)
    k_flat = heights.reshape(-1).astype(jnp.int32)
    p = (i_flat[:, None], j_flat[:, None], k_flat[:, None])
    q = (i_flat[None, :], j_flat[None, :], k_flat[None, :])
    att = attacks(p, q, board_mode=True)
    # Board mode: distinct (i,j) implies the predicate never self-fires except
    # on the exact diagonal; count the strict upper triangle.
    upper = jnp.triu(att, k=1)
    return upper.sum(dtype=jnp.int32)


def board_conflicts(heights, i, j, k) -> jnp.ndarray:
    """O(N^2) one-vs-all conflicts of hypothetical position (i, j, k).

    Counts queens attacking (i, j, k), excluding the queen at column (i, j)
    itself regardless of its height (reference ``mcmc_board.py:147-193``).
    Traceable in (i, j, k); used by the "naive" chain kernel and in tests.
    """
    N = heights.shape[-1]
    i_flat, j_flat = _board_grids(N)
    k_flat = heights.reshape(-1).astype(jnp.int32)
    att = attacks(
        (jnp.int32(i), jnp.int32(j), jnp.int32(k)),
        (i_flat, j_flat, k_flat),
        board_mode=True,
    )
    self_mask = (i_flat == i) & (j_flat == j)
    return jnp.sum(att & ~self_mask, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# Full-3D variant: state is queens (Q, 3) at arbitrary distinct cells.
# ---------------------------------------------------------------------------


def full3d_energy(queens) -> jnp.ndarray:
    """O(Q^2) pairwise energy of a full-3D state (oracle).

    Reference: ``mcmc.py:134-169``.
    """
    q = queens.astype(jnp.int32)
    i, j, k = q[:, 0], q[:, 1], q[:, 2]
    att = attacks(
        (i[:, None], j[:, None], k[:, None]),
        (i[None, :], j[None, :], k[None, :]),
        board_mode=False,
    )
    upper = jnp.triu(att, k=1)
    return upper.sum(dtype=jnp.int32)


def full3d_conflicts(queens, q_idx, pos) -> jnp.ndarray:
    """O(Q) one-vs-all conflicts of queen ``q_idx`` if placed at ``pos``.

    Counts attacks against every *other* queen (queen q_idx masked out),
    matching ``mcmc.py:185-226``.  ``pos`` is an (i, j, k) triple; pass the
    queen's current position to get its current conflict count.
    """
    q = queens.astype(jnp.int32)
    Q = q.shape[0]
    i, j, k = pos
    att = attacks(
        (jnp.int32(i), jnp.int32(j), jnp.int32(k)),
        (q[:, 0], q[:, 1], q[:, 2]),
        board_mode=False,
    )
    mask = jnp.arange(Q) != q_idx
    return jnp.sum(att & mask, dtype=jnp.int32)
