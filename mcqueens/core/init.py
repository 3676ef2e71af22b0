"""State initializers: random / latin / klarner, board and full_3d variants.

Reference semantics (``mcmc_board.py:26-57``, ``mcmc.py:20-101``):

    latin    k = (i + j) mod N
    klarner  k = (3i + 5j) mod N when gcd(N, 210) == 1 (a provably attack-free
             construction, report Thm II.1); otherwise build an MxM Klarner
             core with the largest M < N such that gcd(M, 210) == 1 and fill
             the rest randomly.
    random   board: uniform height per (i, j);
             full_3d: Q distinct cells uniform over the N^3 cube.

All initializers are pure functions of a PRNG key with static shapes, designed
to be ``vmap``-ed over per-chain keys.  Deterministic modes ignore the key.
The klarner fallback's "random distinct non-core cells" is drawn via a random
ranking (argsort of uniforms with core cells pushed to +inf), which samples a
uniformly random distinct subset with fixed shapes — same distribution as the
reference's sequential rejection loop (``mcmc.py:79-90``), no data-dependent
control flow.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

INIT_MODES = ("random", "latin", "klarner")


def _klarner_core_m(N: int) -> int:
    """Largest M < N with gcd(M, 210) == 1 (static Python computation)."""
    for m in range(N - 1, 0, -1):
        if math.gcd(m, 210) == 1:
            return m
    raise ValueError(f"Could not find M < {N} with gcd(M,210)==1 (N={N}).")


def _grids(N: int):
    ii = jnp.arange(N, dtype=jnp.int32)
    return jnp.meshgrid(ii, ii, indexing="ij")


# ---------------------------------------------------------------------------
# Board-constrained heights (N, N).
# ---------------------------------------------------------------------------


def board_init(key, N: int, init_mode: str):
    """Initial heights array (N, N) int32 for the board-constrained chain."""
    i_g, j_g = _grids(N)
    if init_mode == "random":
        return jax.random.randint(key, (N, N), 0, N, dtype=jnp.int32)
    if init_mode == "latin":
        return ((i_g + j_g) % N).astype(jnp.int32)
    if init_mode == "klarner":
        if math.gcd(N, 210) == 1:
            return ((3 * i_g + 5 * j_g) % N).astype(jnp.int32)
        M = _klarner_core_m(N)
        core = (3 * i_g + 5 * j_g) % M
        rand = jax.random.randint(key, (N, N), 0, N, dtype=jnp.int32)
        in_core = (i_g < M) & (j_g < M)
        return jnp.where(in_core, core, rand).astype(jnp.int32)
    raise ValueError(f"Unknown init_mode: {init_mode}")


# ---------------------------------------------------------------------------
# Full-3D queens (Q, 3) + occupancy cube (N^3,).
# ---------------------------------------------------------------------------


def _cells_to_queens(flat_cells, N: int):
    """Decode flat cell ids into (Q, 3) coordinates (i = c // N^2, ...)."""
    k = flat_cells % N
    j = (flat_cells // N) % N
    i = flat_cells // (N * N)
    return jnp.stack([i, j, k], axis=1).astype(jnp.int32)


def full3d_init(key, N: int, init_mode: str, Q: int | None = None):
    """Initial (queens (Q, 3), occupancy (N^3,) bool) for the full-3D chain.

    latin/klarner require Q == N^2 (reference ``mcmc.py:22-26``).
    """
    if Q is None:
        Q = N * N
    N3 = N * N * N
    if init_mode in ("latin", "klarner") and Q != N * N:
        raise ValueError(
            f"{init_mode} initialization assumes Q = N^2, got Q={Q}, N^2={N * N}."
        )

    if init_mode == "random":
        if Q > N3:
            raise ValueError(f"Q={Q} cannot exceed N^3={N3}.")
        # Uniform distinct cells: random ranking of all cells, take the first Q.
        order = jax.random.permutation(key, N3)
        queens = _cells_to_queens(order[:Q], N)
    elif init_mode == "latin":
        i_g, j_g = _grids(N)
        k_g = (i_g + j_g) % N
        queens = jnp.stack(
            [i_g.reshape(-1), j_g.reshape(-1), k_g.reshape(-1)], axis=1
        ).astype(jnp.int32)
    elif init_mode == "klarner":
        i_g, j_g = _grids(N)
        if math.gcd(N, 210) == 1:
            k_g = (3 * i_g + 5 * j_g) % N
            queens = jnp.stack(
                [i_g.reshape(-1), j_g.reshape(-1), k_g.reshape(-1)], axis=1
            ).astype(jnp.int32)
        else:
            # M x M Klarner core; remaining Q - M^2 queens at uniformly random
            # distinct non-core cells.
            M = _klarner_core_m(N)
            core_i, core_j = _grids(M)
            core_k = (3 * core_i + 5 * core_j) % M
            core = jnp.stack(
                [core_i.reshape(-1), core_j.reshape(-1), core_k.reshape(-1)], axis=1
            ).astype(jnp.int32)
            core_cells = core[:, 0] * N * N + core[:, 1] * N + core[:, 2]
            core_mask = jnp.zeros((N3,), bool).at[core_cells].set(True)
            # Random ranking over non-core cells (core pushed to the end).
            scores = jax.random.uniform(key, (N3,)) + core_mask.astype(jnp.float32) * 2.0
            order = jnp.argsort(scores)
            extra = _cells_to_queens(order[: Q - M * M], N)
            queens = jnp.concatenate([core, extra], axis=0)
    else:
        raise ValueError(f"Unknown init_mode: {init_mode}")

    cells = queens[:, 0] * N * N + queens[:, 1] * N + queens[:, 2]
    occ = jnp.zeros((N3,), bool).at[cells].set(True)
    return queens, occ
