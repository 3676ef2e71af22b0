"""Batched hash-based initializers for the Pallas path.

The axon backend's compiler takes minutes to compile vmapped threefry (a bare
``vmap(jax.random.split)`` at 4096 chains exceeds 8 minutes), which made the
standard :mod:`mcqueens.core.init` path unusable for large pallas/bench runs.
This module produces the same *distributions* (uniform iid heights; identical
deterministic latin/klarner structure) from a murmur3-style integer mixer —
pure int32 elementwise ops that compile instantly at any batch size.

Used only by :mod:`mcqueens.kernels.metropolis_pallas`, whose RNG streams are
already a distinct (documented) family; the jnp kernels keep counter-based
threefry init for reference-comparable reproducibility.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from mcqueens.core.init import _klarner_core_m


def _mix(x):
    """murmur3 finalizer: a high-quality 32-bit integer hash (vectorized)."""
    x = x.astype(jnp.uint32)
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> 16)
    return x


def _hash2(seeds, idx, salt: int):
    """High-quality 2-D hash: mix each coordinate separately, then combine.

    Mixing the raw lattice ``seed*A + idx*B`` directly leaves measurable
    bucket bias (~2% on mod-N buckets, tested); hashing the coordinates
    independently before combining restores statistical uniformity.
    """
    hs = _mix(jnp.asarray(seeds, jnp.uint32) ^ jnp.uint32(salt * 0x632BE59B + 1))
    hi = _mix(jnp.asarray(idx, jnp.uint32) + jnp.uint32(0xDEADBEEF))
    return _mix(hs[:, None] ^ (hi[None, :] * jnp.uint32(0x9E3779B9)))


def uniform_ints(seeds, shape_per_seed, bound: int, salt: int = 0):
    """(C, *shape) integers uniform in [0, bound) from per-chain seeds."""
    seeds = jnp.asarray(seeds, jnp.uint32)
    n = 1
    for s in shape_per_seed:
        n *= s
    r = _hash2(seeds, jnp.arange(n, dtype=jnp.uint32), salt)
    # modulo bias <= bound / 2^32 — negligible for bound <= N^3
    vals = (r % jnp.uint32(bound)).astype(jnp.int32)
    return vals.reshape((seeds.shape[0],) + tuple(shape_per_seed))


def _rank_cells(seeds, N3: int, blocked_mask=None, salt: int = 2):
    """Random ranking of all cells per chain (uniform random distinct order).

    blocked_mask (N3,) pushes given cells to the end of the order.
    """
    seeds = jnp.asarray(seeds, jnp.uint32)
    scores = _hash2(seeds, jnp.arange(N3, dtype=jnp.uint32), salt)
    if blocked_mask is not None:
        scores = jnp.where(blocked_mask[None, :], jnp.uint32(0xFFFFFFFF), scores)
    # ties cannot produce duplicate cells: we sort the cell ids themselves
    return jnp.argsort(scores, axis=1)


def _cells_to_queens(cells, N: int):
    k = cells % N
    j = (cells // N) % N
    i = cells // (N * N)
    return jnp.stack([i, j, k], axis=-1).astype(jnp.int32)


def full3d_init_batch(seeds, N: int, init_mode: str, Q: int | None = None):
    """(C, Q, 3) int32 initial queens for a batch of full-3D chains."""
    if Q is None:
        Q = N * N
    C = jnp.asarray(seeds).shape[0]
    N3 = N * N * N
    if init_mode in ("latin", "klarner") and Q != N * N:
        raise ValueError(
            f"{init_mode} initialization assumes Q = N^2, got Q={Q}, N^2={N * N}."
        )
    if init_mode == "random":
        if Q > N3:
            raise ValueError(f"Q={Q} cannot exceed N^3={N3}.")
        order = _rank_cells(seeds, N3)
        return _cells_to_queens(order[:, :Q], N)

    ii = jnp.arange(N, dtype=jnp.int32)
    i_g, j_g = jnp.meshgrid(ii, ii, indexing="ij")
    if init_mode == "latin":
        k_g = (i_g + j_g) % N
        q = jnp.stack(
            [i_g.reshape(-1), j_g.reshape(-1), k_g.reshape(-1)], axis=-1
        ).astype(jnp.int32)
        return jnp.broadcast_to(q, (C, N * N, 3))
    if init_mode == "klarner":
        if math.gcd(N, 210) == 1:
            k_g = (3 * i_g + 5 * j_g) % N
            q = jnp.stack(
                [i_g.reshape(-1), j_g.reshape(-1), k_g.reshape(-1)], axis=-1
            ).astype(jnp.int32)
            return jnp.broadcast_to(q, (C, N * N, 3))
        M = _klarner_core_m(N)
        ci = jnp.arange(M, dtype=jnp.int32)
        c_i, c_j = jnp.meshgrid(ci, ci, indexing="ij")
        c_k = (3 * c_i + 5 * c_j) % M
        core = jnp.stack(
            [c_i.reshape(-1), c_j.reshape(-1), c_k.reshape(-1)], axis=-1
        ).astype(jnp.int32)
        core_cells = (core[:, 0] * N + core[:, 1]) * N + core[:, 2]
        blocked = jnp.zeros((N3,), bool).at[core_cells].set(True)
        order = _rank_cells(seeds, N3, blocked_mask=blocked)
        extra = _cells_to_queens(order[:, : Q - M * M], N)
        core_b = jnp.broadcast_to(core, (C, M * M, 3))
        return jnp.concatenate([core_b, extra], axis=1)
    raise ValueError(f"Unknown init_mode: {init_mode}")


def board_init_batch(seeds, N: int, init_mode: str):
    """(C, N, N) int32 initial heights for a batch of chains."""
    C = jnp.asarray(seeds).shape[0]
    ii = jnp.arange(N, dtype=jnp.int32)
    i_g, j_g = jnp.meshgrid(ii, ii, indexing="ij")
    if init_mode == "random":
        return uniform_ints(seeds, (N, N), N)
    if init_mode == "latin":
        h = ((i_g + j_g) % N).astype(jnp.int32)
        return jnp.broadcast_to(h, (C, N, N))
    if init_mode == "klarner":
        if math.gcd(N, 210) == 1:
            h = ((3 * i_g + 5 * j_g) % N).astype(jnp.int32)
            return jnp.broadcast_to(h, (C, N, N))
        M = _klarner_core_m(N)
        core = ((3 * i_g + 5 * j_g) % M).astype(jnp.int32)
        rand = uniform_ints(seeds, (N, N), N, salt=1)
        in_core = (i_g < M) & (j_g < M)
        return jnp.where(in_core[None], core[None], rand)
    raise ValueError(f"Unknown init_mode: {init_mode}")
